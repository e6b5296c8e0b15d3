from genmmrec_tpu.data.dataset import RecDataset
from genmmrec_tpu.data.arrays import TrainData, EvalData, build_train_data, build_eval_data
