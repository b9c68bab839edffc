"""Process-level runtime setup for all entry points.

Two measured wins, both applied before any jax backend use:

* persistent compilation cache: this environment's remote TPU compiler
  takes 1-5 min per large program; the cache turns repeat launches into
  ~seconds (measured 126s -> 1.7s).  Dir: $MMHAND_COMPILE_CACHE or
  ~/.cache/mmhand_tpu/jax; set MMHAND_COMPILE_CACHE=0 to disable.
* hardware 'rbg' PRNG for dropout masks (see fast_prng.py; ~25% step time).
"""

from __future__ import annotations

import os

from mmhand_tpu.utils.fast_prng import enable_fast_prng


def setup_runtime(prng: bool = True, compile_cache: bool = True) -> None:
    import jax

    if prng:
        enable_fast_prng()
    if compile_cache:
        cache = os.environ.get("MMHAND_COMPILE_CACHE")
        if cache != "0":
            cache = cache or os.path.expanduser("~/.cache/mmhand_tpu/jax")
            try:
                os.makedirs(cache, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 5.0)
            except Exception:
                pass


def lazy_aot(jitted):
    """Wrap a jitted step so its one-time trace runs with a CPU default
    device, then lower/compile for the args' real (TPU) devices.

    Why: tracing executes every concrete-operand op eagerly on the
    default device; through the axon TPU tunnel each such dispatch is a
    network round-trip, which turns the flagship step's trace into
    930-1100 s of mostly-sleep (measured r5).  Tracing with the host CPU
    as default device cuts that to ~11 s (+ ~205 s of pure-CPU MLIR
    lowering); XLA compilation still targets the devices the arguments
    live on, and the executable is bit-identical modulo constants now
    folded on host.  No-op on CPU backends (tests) and when the AOT API
    is unavailable.

    The wrapper re-traces if called with arguments whose shapes/dtypes no
    longer match the compiled executable (jit semantics preserved)."""
    import jax

    cache: dict = {}

    def call(*args):
        if "c" not in cache:
            try:
                cpu = jax.devices("cpu")[0]
                assert jax.default_backend() != "cpu"
                with jax.default_device(cpu):
                    traced = jitted.trace(*args)
                cache["c"] = traced.lower().compile()
            except Exception:
                cache["c"] = jitted
        try:
            return cache["c"](*args)
        except (TypeError, ValueError):
            if cache["c"] is jitted:
                raise
            cache["c"] = jitted  # shape change: fall back to plain jit
            return jitted(*args)

    return call
