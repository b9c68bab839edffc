from mmhand_tpu.train.pool import PoolState, pool_init, pool_query
from mmhand_tpu.train.state import MMHandSystem, MMHandTrainState
from mmhand_tpu.train.step import lr_for_epoch, make_eval_step, make_train_step

__all__ = [
    "PoolState", "pool_init", "pool_query",
    "MMHandSystem", "MMHandTrainState",
    "lr_for_epoch", "make_train_step", "make_eval_step",
]
