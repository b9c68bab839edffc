"""Optional dynamic loss scaling for fp16 parity experiments.

TPU-native counterpart of APEX amp O1's per-loss scalers + cross-rank
overflow vote (reference models/MMHandModel.py:294-308).  bf16 training
needs none of this — bf16 has the f32 exponent range, so the default
PrecisionConfig documents the machinery out — but compute_dtype='float16'
(or a deliberate parity experiment at any dtype) can enable it to mirror
the reference's AMP semantics exactly:

* one scaler per loss (amp's ``scale_loss(loss, opt, id)`` with
  num_losses=3, reference MMHandModel.py:99-108): G, D_PP, D_PB;
* each loss is multiplied by its scale before backward and the grads
  divided after; non-finite unscaled grads raise the step's overflow flag;
* the flag is OR-reduced across data-parallel replicas (the
  ``reduce_tensor`` vote, reference :301-306) and STICKY within the step:
  an earlier phase's overflow skips every later optimizer update too
  (reference optimize_parameters :315-328 checks ``self.overflow`` before
  each ``optimizer.step()``), and resets at step end (:330);
* scale management follows torch.cuda.amp.GradScaler defaults (the
  behavior amp O1's dynamic scaling approximates): init 2**16, backoff
  x0.5 on overflow, growth x2 after 2000 consecutive clean steps.

Scales are powers of two, so scale/unscale of any individual value is
exact in f32.  The end-to-end step is NOT bit-identical, though: XLA
constant-folds the scale into adjacent ops (e.g. a mean's 1/N divisor,
with N not a power of two), which reorders rounding — ~1 ulp on the
gradients.  Adam then amplifies that where a gradient sits near its eps
(update lr*g/(|g|+eps) has sensitivity ~lr/(4 eps) at |g|~eps), so
isolated parameters can move ~5e-6 while the bulk agrees to ~1e-7
(tested in tests/test_train.py::TestLossScaling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

INIT_SCALE = 2.0 ** 16
BACKOFF = 0.5
GROWTH = 2.0
GROWTH_INTERVAL = 2000


class LossScaleState(struct.PyTreeNode):
    """One dynamic scaler (torch.cuda.amp.GradScaler semantics)."""

    scale: jnp.ndarray         # f32 scalar, power of two
    growth_count: jnp.ndarray  # int32: consecutive clean steps


def init_scale(init: float = INIT_SCALE) -> LossScaleState:
    return LossScaleState(scale=jnp.asarray(init, jnp.float32),
                          growth_count=jnp.zeros((), jnp.int32))


def init_scales() -> dict:
    """The three per-loss scalers (amp num_losses=3,
    reference MMHandModel.py:103-108)."""
    return {"g": init_scale(), "d_pp": init_scale(), "d_pb": init_scale()}


def grads_overflow(grads) -> jnp.ndarray:
    """True iff any gradient leaf holds a non-finite value (the per-rank
    half of the overflow vote, reference :299-300)."""
    leaves = jax.tree.leaves(grads)
    if not leaves:
        return jnp.zeros((), jnp.bool_)
    return jnp.logical_not(
        jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in leaves])))


def unscale(grads, scale_state: LossScaleState):
    inv = 1.0 / scale_state.scale
    return jax.tree.map(lambda g: g * inv, grads)


def update_scale(s: LossScaleState, overflow: jnp.ndarray) -> LossScaleState:
    """GradScaler update: backoff on overflow, growth after
    GROWTH_INTERVAL consecutive clean steps; scale floored at 1."""
    grew = s.growth_count + 1 >= GROWTH_INTERVAL
    new_scale = jnp.where(
        overflow, jnp.maximum(s.scale * BACKOFF, 1.0),
        jnp.where(grew, s.scale * GROWTH, s.scale))
    new_count = jnp.where(jnp.logical_or(overflow, grew),
                          jnp.zeros((), jnp.int32), s.growth_count + 1)
    return LossScaleState(scale=new_scale, growth_count=new_count)


def select(ok: jnp.ndarray, new_tree, old_tree):
    """Elementwise keep `new_tree` where ok else `old_tree` (the traced
    equivalent of `if not self.overflow: optimizer.step()`)."""
    return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_tree, old_tree)
