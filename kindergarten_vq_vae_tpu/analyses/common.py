"""Shared analysis utilities.

The reference reconstructs models from ``run_conf.json`` + checkpoint
(analyses/latent_traversals/...py:41-55) — and because its ``shelgon*`` dirs
were renamed over the project's life, analyses must match models by
signature, not directory (SURVEY §2.9.4). Here ``load_run`` reads the
config's explicit ``model_name`` instead — the pairing contract is
preserved, the ambiguity is not.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from kindergarten_vq_vae_tpu.ckpt.checkpoint import restore_checkpoint
from kindergarten_vq_vae_tpu.train.config import RunConfig
from kindergarten_vq_vae_tpu.train.variants import build_model, init_params


def load_run(run_path: str, ckpt_name: str | None = None):
    """(cfg, model, params) from a run directory."""
    cfg = RunConfig.load(os.path.join(run_path, "run_conf.json"))
    model = build_model(cfg, stage="test")
    template = init_params(cfg, jax.random.key(0))
    if ckpt_name is None:
        ckpt_name = f"{cfg.model.model_name}_ckpt_loss_recon_val_best"
    params = restore_checkpoint(os.path.join(run_path, ckpt_name), template)
    # device-resident ONCE: restore_checkpoint returns host numpy leaves,
    # and passing those into a jitted batch loop re-transfers the whole
    # param tree every call — ~450 MB/step through the TPU tunnel at
    # bert-base (measured round 5: the flagship test sweep ran at 36
    # sent/s instead of ~20k for exactly this reason).
    params = jax.device_put(params)
    return cfg, model, params


def batched_apply(fn, arrays: dict, batch_size: int, lim_batches_pct: float = 1.0):
    """Run a jitted fn over fixed-size batches of a column store; pads the
    tail and trims outputs back. Returns stacked numpy outputs."""
    n = len(next(iter(arrays.values())))
    n_batches = -(-n // batch_size)
    n_batches = max(1, int(n_batches * lim_batches_pct))
    outs = []
    for b in range(n_batches):
        sl = slice(b * batch_size, (b + 1) * batch_size)
        chunk = {k: v[sl] for k, v in arrays.items()}
        m = len(next(iter(chunk.values())))
        if m < batch_size:
            chunk = {
                k: np.concatenate([v, np.repeat(v[:1], batch_size - m, axis=0)])
                for k, v in chunk.items()
            }
        out = fn(**{k: jnp.asarray(v) for k, v in chunk.items()})
        out = jax.tree_util.tree_map(lambda x: np.asarray(x)[:m], out)
        outs.append(out)
    return jax.tree_util.tree_map(lambda *xs: np.concatenate(xs), *outs)
