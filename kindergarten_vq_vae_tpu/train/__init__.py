from kindergarten_vq_vae_tpu.train.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
)
from kindergarten_vq_vae_tpu.train.freezing import trainable_mask
from kindergarten_vq_vae_tpu.train.optim import make_optimizer
from kindergarten_vq_vae_tpu.train.engine import Engine
