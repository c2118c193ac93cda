from dreamfusion_tpu.training.trainer import Trainer, TrainState  # noqa: F401
