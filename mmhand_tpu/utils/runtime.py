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
