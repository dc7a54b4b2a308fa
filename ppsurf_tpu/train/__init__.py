from ppsurf_tpu.train.model import ModelSpec, poco_spec, ppsurf_spec  # noqa: F401
from ppsurf_tpu.train.loop import Trainer, TrainConfig, TrainState  # noqa: F401
