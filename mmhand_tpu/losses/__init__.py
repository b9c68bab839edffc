from mmhand_tpu.losses.gan import gan_loss
from mmhand_tpu.losses.perceptual import L1PlusPerceptual

__all__ = ["gan_loss", "L1PlusPerceptual"]
