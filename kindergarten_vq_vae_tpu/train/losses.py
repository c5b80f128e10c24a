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


def kl_recon_loss_reference(logits, target_ids, valid_row):
    """Naive formulation (correctness oracle for the fused loss below)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None], axis=-1)[..., 0]  # (B, S)
    w = valid_row.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0) * nll.shape[1]
    return jnp.sum(nll * w) / denom


@jax.custom_vjp
def kl_recon_loss(logits: jnp.ndarray, target_ids: jnp.ndarray, valid_row: jnp.ndarray) -> jnp.ndarray:
    """(B, S, V) logits vs (B, S) int targets -> scalar mean-NLL.

    HBM-traffic-engineered custom VJP. The naive autodiff of
    log_softmax + take_along_axis materializes a dozen (B*S, V) f32
    intermediates (iota/compare/select from the gather's transpose, full
    log-probs, softmax recompute) — ~90 GB/step at bert-base batch 1024,
    which made the whole train step bandwidth-bound. Here the forward is
    max + logsumexp + gather (three reads of logits) and the backward emits
    ``softmax - one_hot`` in a single fused expression (one read, one write).
    """
    loss, _ = _ce_fwd(logits, target_ids, valid_row)
    return loss


def _ce_stats(logits, target_ids):
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m[..., None]), axis=-1))  # (B, S)
    tl = jnp.take_along_axis(logits, target_ids[..., None], axis=-1)[..., 0].astype(jnp.float32)
    return lse, tl


def _ce_fwd(logits, target_ids, valid_row):
    lse, tl = _ce_stats(logits, target_ids)
    w = valid_row.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0) * logits.shape[1]
    loss = jnp.sum((lse - tl) * w) / denom
    return loss, (logits, target_ids, lse, w, denom)


def _ce_bwd(res, g):
    logits, target_ids, lse, w, denom = res
    # softmax - one_hot, fused: probs from stored lse (no extra reduction)
    p = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    vocab_iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
    grad = p - (vocab_iota == target_ids[..., None]).astype(jnp.float32)
    scale = (g / denom) * w[..., None]
    g_logits = (grad * scale).astype(logits.dtype)
    return g_logits, None, None


kl_recon_loss.defvjp(_ce_fwd, _ce_bwd)


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
