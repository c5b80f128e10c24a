"""Optimizer construction: Adam(+amsgrad, L2 weight decay) with optional
MultiStepLR, masked by the freezing mode.

Parity notes:
- torch ``Adam(lr, weight_decay, amsgrad)`` (models/bagon/main.py:76): the
  weight decay is L2-added-to-gradient *before* the moment updates (not
  AdamW), hence ``add_decayed_weights`` FIRST in the chain.
- ``MultiStepLR(milestones, gamma)`` stepped per optimizer step
  (models/bagon/Trainer.py:121-122): a piecewise-constant schedule over
  steps.
- freezing masks (train/freezing.py) zero the updates of frozen params via
  ``optax.multi_transform`` + ``set_to_zero`` (``optax.masked`` would pass
  raw gradients through for frozen leaves).
"""

from __future__ import annotations

import jax
import optax

from kindergarten_vq_vae_tpu.train.config import OptimConfig


def make_lr_schedule(cfg: OptimConfig):
    if cfg.lr_scheduler == "MultiStepLR" and cfg.milestones:
        boundaries = {int(m): cfg.gamma for m in cfg.milestones}
        return optax.piecewise_constant_schedule(cfg.lr, boundaries)
    return cfg.lr


def make_optimizer(cfg: OptimConfig, trainable_mask=None) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    chain = []
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    if cfg.amsgrad:
        chain.append(optax.scale_by_amsgrad())
    else:
        chain.append(optax.scale_by_adam())
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx
