from mmhand_tpu.hand3d.pipeline import PipelineConfig, derive_batch
from mmhand_tpu.hand3d.system import (
    Hand3DSystem,
    TRAIN_PARA_HANDSEGNET,
    TRAIN_PARA_LIFTING,
    TRAIN_PARA_POSENET,
    staged_lr,
)
