from mmhand_tpu.utils.checkpoint import CheckpointManager
from mmhand_tpu.utils.logging import Visualizer
from mmhand_tpu.utils.visualize import tensor2im, seven_tile_strip

__all__ = ["CheckpointManager", "Visualizer", "tensor2im", "seven_tile_strip"]
