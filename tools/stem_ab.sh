#!/bin/bash
# Full-step A/B matrix for the r3 stem restructurings (run on the chip).
# Trusted methodology: whole-step bench.py timings only (per-op
# microbenches on the axon tunnel are indicative-only — CLAUDE.md).
#
#   bash tools/stem_ab.sh [out_dir]
#
# Variants:
#   control   current defaults (padadd reflect + d2s head + D-stem split)
#   nosplit   MMHAND_DSTEM_SPLIT=0      (isolates the D-stem split gain)
#   fused     MMHAND_G_STEM_FUSED=1     (adds fused block-diag G stems)
#   pre_r3b   both off                  (the 45.39 img/s configuration)
set -u
out=${1:-/tmp/stem_ab}
mkdir -p "$out"
run() {
  name=$1; shift
  echo "=== $name ($*)" | tee -a "$out/summary.txt"
  env "$@" timeout 900 python bench.py 2>&1 | grep -v -i warn \
    | tee "$out/$name.log" | tail -1 | tee -a "$out/summary.txt"
}
run control   MMHAND_NOOP=1
run nosplit   MMHAND_DSTEM_SPLIT=0
run fused     MMHAND_G_STEM_FUSED=1
# With G stems fused, MMHAND_STEM_IMPL=s2d only reroutes the D stems —
# isolates the D-side space-to-depth that the all-stems A/B (40.67) mixed
# with the G-side loss.
run fused_ds2d MMHAND_G_STEM_FUSED=1 MMHAND_STEM_IMPL=s2d
run fusedbn   MMHAND_G_STEM_FUSED=2
# Dot-product BN statistics (ops/bn_stats.py): attacks the ~24 ms of
# pathological full-res convert_reduce_fusion stat reductions directly —
# composes with (and is a superset of what) fusedbn fixes on the G side,
# and also covers the D stems.
run bnstats   MMHAND_BN_STATS=dot
run fusedbn_dot MMHAND_G_STEM_FUSED=2 MMHAND_BN_STATS=dot
run up_d2s    MMHAND_UPCONV_SHUFFLE=d2s
run up_conv4  MMHAND_UPCONV_SHUFFLE=conv4
run pre_r3b   MMHAND_DSTEM_SPLIT=0 MMHAND_G_STEM_FUSED=0
echo "--- summary ---"
cat "$out/summary.txt"
