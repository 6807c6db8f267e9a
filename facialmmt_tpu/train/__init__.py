from facialmmt_tpu.train.metrics import eval_meld, weighted_f1, per_class_f1
from facialmmt_tpu.train.optim import (make_optimizer, make_schedule,
                                       MultiTaskState)
