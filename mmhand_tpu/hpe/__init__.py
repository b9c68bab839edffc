from mmhand_tpu.hpe.system import HPESystem, make_hpe_train_step
from mmhand_tpu.hpe.data import HPEMixDataset, make_hpe_prepare_batch

__all__ = ["HPESystem", "make_hpe_train_step",
           "HPEMixDataset", "make_hpe_prepare_batch"]
