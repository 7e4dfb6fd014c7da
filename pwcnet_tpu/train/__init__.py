from pwcnet_tpu.train.state import TrainState  # noqa: F401
from pwcnet_tpu.train.schedule import (  # noqa: F401
    S_FINE,
    S_LONG,
    ScheduleConfig,
    make_lr_schedule,
    make_optimizer,
)
from pwcnet_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
from pwcnet_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from pwcnet_tpu.train.evaluate import (  # noqa: F401
    evaluate_dataset,
    pad_to_divisible,
    predict_flow,
)
from pwcnet_tpu.train.metrics import MetricsWriter  # noqa: F401
