"""Model zoo: PATN 3-stream generator, ResNet discriminator, VGG19 features,
CPM pose estimators, Inception-v3 — all flax.linen, NHWC, bf16 compute."""

from mmhand_tpu.models.generator import Generator
from mmhand_tpu.models.discriminator import Discriminator
from mmhand_tpu.models.layers import NormConfig

__all__ = ["Generator", "Discriminator", "NormConfig"]
