"""Per-op TPU profile of the full GAN train step via xplane parsing.

`tensorboard_plugin_profile`'s converter is broken against this TF build
(missing `xspace_to_tools_data` pywrap symbol), but the raw XSpace proto
schema ships with tensorflow (`tensorflow.tsl.profiler.protobuf.xplane_pb2`),
so this tool captures a `jax.profiler.trace` of the jitted train step and
aggregates device-plane event durations by HLO category / op name directly.

Usage:
    python tools/xplane_report.py [--batch 16] [--iters 5] [--top 40]
    python tools/xplane_report.py --parse-only /tmp/mmhand_profile

Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (set automatically
by re-exec if missing) because the installed protobuf runtime is newer than
the TF-generated _pb2 modules.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
from pathlib import Path

if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def capture(batch: int, iters: int, out_dir: str) -> None:
    from mmhand_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax

    from tools.profile_step import build, make_data

    data = make_data(batch)
    cfg, system, l1, step = build()
    state = system.init_state(jax.random.PRNGKey(0), local_batch_size=batch)
    out = step(state, data, 2e-4)
    jax.block_until_ready(out)
    with jax.profiler.trace(out_dir):
        for _ in range(iters):
            out = step(out[0], data, 2e-4)
        jax.block_until_ready(out)


def load_xspaces(out_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(Path(out_dir).rglob("*.xplane.pb"),
                   key=lambda p: p.stat().st_mtime)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {out_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(paths[-1].read_bytes())
    return xs


def report(out_dir: str, top: int, iters: int,
           cat_filter: str | None = None) -> None:
    xs = load_xspaces(out_dir)
    planes = {p.name: p for p in xs.planes}
    dev = None
    for name, p in planes.items():
        low = name.lower()
        if "tpu" in low and "host" not in low:
            # prefer the plane with the most events (the op-trace plane)
            n = sum(len(l.events) for l in p.lines)
            if dev is None or n > dev[1]:
                dev = (p, n)
    if dev is None:
        print("planes found:", list(planes))
        raise SystemExit("no TPU device plane in trace")
    plane, n_events = dev
    print(f"# device plane: {plane.name!r}  ({n_events} events)\n")

    stats = {k: v.name for k, v in plane.stat_metadata.items()}
    evmeta = dict(plane.event_metadata.items())

    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_count = collections.Counter()
    op_cat = {}
    total_ps = 0
    for line in plane.lines:
        # ONLY the serialized execution line: "Async XLA Ops" spans overlap
        # compute (summing them ~7x-overcounts), "Steps"/"XLA Modules" are
        # summaries.  "XLA Ops" totals match wall time (359.8 ms/step vs
        # 364 measured).
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = evmeta.get(ev.metadata_id)
            name = md.name if md else str(ev.metadata_id)
            dur = ev.duration_ps
            total_ps += dur
            cat = None
            for st in ev.stats:
                sname = stats.get(st.metadata_id, "")
                if sname in ("hlo_category", "category"):
                    cat = st.str_value
                    break
            if cat is None and md is not None:
                for st in md.stats:
                    sname = stats.get(st.metadata_id, "")
                    if sname in ("hlo_category", "category"):
                        cat = st.str_value
                        break
            by_cat[cat or "?"] += dur
            by_op[name] += dur
            op_count[name] += 1
            op_cat[name] = cat or "?"

    if total_ps == 0:
        print("no XLA-op events; lines present:")
        for line in plane.lines:
            print(f"  {line.name!r}: {len(line.events)} events")
        return

    ms = 1e-9  # ps -> ms
    print(f"total device op time: {total_ps*ms:.1f} ms over {iters} iters "
          f"= {total_ps*ms/iters:.1f} ms/step\n")
    print("| hlo category | ms/step | share |")
    print("|---|---|---|")
    for cat, d in by_cat.most_common():
        print(f"| {cat} | {d*ms/iters:8.2f} | {100*d/total_ps:5.1f}% |")
    print(f"\n## top {top} ops" + (f" (category ~ {cat_filter!r})"
                                   if cat_filter else ""))
    print("| cat | op | calls | ms/step | share |")
    print("|---|---|---|---|---|")
    shown = 0
    for name, d in by_op.most_common():
        if cat_filter and cat_filter not in op_cat[name]:
            continue
        print(f"| {op_cat[name]} | {name[:110]} | {op_count[name]} "
              f"| {d*ms/iters:8.2f} | {100*d/total_ps:5.1f}% |")
        shown += 1
        if shown >= top:
            break


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/mmhand_profile")
    ap.add_argument("--parse-only", default=None)
    ap.add_argument("--cat", default=None, help="substring filter on hlo category")
    args = ap.parse_args()
    if args.parse_only:
        report(args.parse_only, args.top, args.iters, args.cat)
        return
    capture(args.batch, args.iters, args.dir)
    report(args.dir, args.top, args.iters, args.cat)


if __name__ == "__main__":
    main()
