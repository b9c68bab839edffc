from mmhand_tpu.eval.metrics import EvalUtil, inception_score_from_logits, fid_from_features
from mmhand_tpu.eval.evaluator import Evaluator, HPEJudge

__all__ = ["EvalUtil", "inception_score_from_logits", "fid_from_features",
           "Evaluator", "HPEJudge"]
