"""L1 + VGG19 perceptual loss
(reference losses/L1_plus_perceptualLoss.py:11-75):

    total = lambda_A * L1(fake, real)
          + lambda_B * dist(VGG19[:k](renorm(fake)), stopgrad(same(real)))

where dist is L1 (`percep_is_l1`) or MSE, and renorm maps [-1,1] ->
ImageNet-normalized.  The reference wraps VGG in nn.DataParallel; here the
extractor is just jitted alongside the step (data parallelism comes from
the mesh sharding of the whole step, not per-module wrappers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mmhand_tpu.models.vgg import VGG19Features, imagenet_renorm


@dataclasses.dataclass(frozen=True)
class L1PlusPerceptual:
    """Callable loss; holds the (frozen) VGG feature params.

    When both lambdas are zero, returns zeros without computing anything
    (reference :33-35).
    """

    lambda_l1: float = 10.0
    lambda_perceptual: float = 10.0
    perceptual_layers: int = 3
    percep_is_l1: bool = True
    vgg_variables: Optional[Any] = None  # {'params': ...}; frozen features
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        object.__setattr__(
            self, "_vgg", VGG19Features(truncate_at=self.perceptual_layers,
                                        dtype=self.dtype))

    def init_vgg(self, rng, image_shape=(1, 256, 256, 3)):
        """Random-init VGG params (fallback when no converted weights)."""
        return self._vgg.init(rng, jnp.zeros(image_shape, jnp.float32))

    def __call__(self, fake, real):
        """Args are NHWC images in [-1, 1].  Returns (total, l1, percep)."""
        if self.lambda_l1 == 0 and self.lambda_perceptual == 0:
            z = jnp.zeros((), jnp.float32)
            return z, z, z
        loss_l1 = jnp.mean(jnp.abs(fake - real)) * self.lambda_l1

        f_fake = self._vgg.apply(self.vgg_variables, imagenet_renorm(fake))
        f_real = jax.lax.stop_gradient(
            self._vgg.apply(self.vgg_variables, imagenet_renorm(real)))
        if self.percep_is_l1:
            percep = jnp.mean(jnp.abs(f_fake - f_real)) * self.lambda_perceptual
        else:
            percep = jnp.mean((f_fake - f_real) ** 2) * self.lambda_perceptual
        return loss_l1 + percep, loss_l1, percep
