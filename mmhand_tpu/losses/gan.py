"""GAN loss on discriminator feature-map logits.

The reference GANLoss is ALWAYS BCEWithLogits against a scalar target
expanded to the prediction's shape — the `use_lsgan` flag is accepted but
ignored (reference models/network_utils.py:129-163; the unused twin at
models/utils.py:117-151 honors MSE).  `mode="vanilla"` reproduces the active
behavior; `mode="lsgan"` provides the honored variant.
"""

from __future__ import annotations

import jax.numpy as jnp


def gan_loss(logits, target_is_real: bool, mode: str = "vanilla"):
    """Mean BCE-with-logits (or MSE) of a feature-map prediction vs an
    all-real / all-fake target.

    Args:
      logits: discriminator output, any shape (the reference's D emits a
        full feature map, not a 1-channel score — see Discriminator docs).
      target_is_real: python bool (static; the step is traced per phase).
      mode: "vanilla" (BCE-with-logits) | "lsgan" (MSE).
    """
    logits = jnp.asarray(logits, jnp.float32)
    if mode == "vanilla":
        # BCEWithLogits(x, t) = softplus(x) - t*x, numerically stable form
        if target_is_real:
            return jnp.mean(jnp.logaddexp(0.0, -logits))
        return jnp.mean(jnp.logaddexp(0.0, logits))
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((logits - target) ** 2)
    raise NotImplementedError(f"gan loss mode [{mode}]")
