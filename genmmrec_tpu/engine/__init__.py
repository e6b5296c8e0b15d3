from genmmrec_tpu.engine.metrics import metrics_dict
from genmmrec_tpu.engine.evaluator import TopKEvaluator
from genmmrec_tpu.engine.trainer import Trainer, get_trainer
