"""Loss functions, exact reference forms, jit-compiled.

The reference's reconstruction loss is
``kl_div(log_softmax(logits), one_hot(target), reduction="batchmean")``
(models/bagon/Trainer.py:103-107). With a one-hot target, each row's KL is
the NLL at the hot index and batchmean divides by the number of rows — i.e.
mean token NLL. Implemented with a gather instead of materializing the
(B*S, vocab) one-hot (the reference allocates it every step).

All losses take a ``valid_row`` mask ((B,) 1/0) so the padded tail batch
contributes nothing (the reference sidesteps this by mis-weighting stats,
SURVEY §2.9.2 — fixed here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_recon_loss(logits: jnp.ndarray, target_ids: jnp.ndarray, valid_row: jnp.ndarray) -> jnp.ndarray:
    """(B, S, V) logits vs (B, S) int targets -> scalar mean-NLL."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None], axis=-1)[..., 0]  # (B, S)
    w = valid_row.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0) * nll.shape[1]
    return jnp.sum(nll * w) / denom


def kl_onehot_loss(logits: jnp.ndarray, one_hot_target: jnp.ndarray, valid_row: jnp.ndarray) -> jnp.ndarray:
    """KL(one_hot || softmax(logits)), batchmean over all leading rows.

    ``logits``/``one_hot_target``: (B, R, C) — R rows per example, C classes
    (e.g. shelgon latent-pred loss, shelgon/Trainer.py:123-127; shelgon2
    latent loss over 8x3, shelgon2/Trainer.py:101-105).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_row = -jnp.sum(one_hot_target.astype(jnp.float32) * logp, axis=-1)  # (B, R)
    w = valid_row.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0) * per_row.shape[1]
    return jnp.sum(per_row * w) / denom
