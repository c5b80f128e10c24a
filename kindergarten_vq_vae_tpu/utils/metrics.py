"""Sequence / codebook metrics as pure jnp functions (jit/vmap friendly).

Parity notes:
- ``seq_acc`` reproduces common/metrics.py:8-36 exactly, including the
  deliberate quirk that padding positions count as matches (SURVEY §2.9.9).
- ``seq_acc_masked`` is the fixed variant (pad-aware) — new capability.
- ``codebook_perplexity`` reproduces models/shelgon3/VectorQuantizer.py:84-85.
"""

from __future__ import annotations

import jax.numpy as jnp


def seq_acc(recon_ids: jnp.ndarray, target_ids: jnp.ndarray):
    """Token-level accuracy.

    Returns ``(acc_per_batch, acc_per_sentence)`` like common/metrics.py:8-36.
    Padding positions count as correct (parity with the reference metric).
    """
    assert recon_ids.shape == target_ids.shape, "input and target shapes must match"
    assert jnp.issubdtype(recon_ids.dtype, jnp.integer), "recon_ids must be integer"
    assert jnp.issubdtype(target_ids.dtype, jnp.integer), "target_ids must be integer"

    match = recon_ids == target_ids
    acc_per_batch = jnp.mean(match.astype(jnp.float32))
    acc_per_sentence = jnp.mean(match.astype(jnp.float32), axis=-1)
    return acc_per_batch, acc_per_sentence


def seq_acc_masked(recon_ids: jnp.ndarray, target_ids: jnp.ndarray, mask: jnp.ndarray):
    """Pad-aware token accuracy (fixes SURVEY §2.9.9; not in the reference).

    ``mask`` is 1 for real tokens, 0 for padding. Sentences with an empty mask
    contribute accuracy 0.
    """
    match = (recon_ids == target_ids).astype(jnp.float32) * mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1)
    acc_per_batch = jnp.sum(match) / denom
    denom_s = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    acc_per_sentence = jnp.sum(match, axis=-1) / denom_s
    return acc_per_batch, acc_per_sentence


def codebook_perplexity(one_hot_codes: jnp.ndarray) -> jnp.ndarray:
    """exp(-sum p log p) over mean codebook usage.

    ``one_hot_codes`` is (N, n_e); parity with
    models/shelgon3/VectorQuantizer.py:84-85.
    """
    e_mean = jnp.mean(one_hot_codes, axis=0)
    return jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))


def perplexity_from_counts(counts: jnp.ndarray, total: jnp.ndarray | int) -> jnp.ndarray:
    """Same perplexity computed from per-code counts (used by the fused
    Pallas VQ kernel, which returns counts instead of the (N, n_e) one-hot)."""
    e_mean = counts.astype(jnp.float32) / jnp.maximum(total, 1)
    return jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))


def padding_tokens_pct(input_ids: jnp.ndarray, pad_id: int = 0) -> jnp.ndarray:
    """Mean % of padding tokens per sentence.

    The reference stubs this to -69 (models/bagon/Trainer.py:129); here it is
    implemented for real (models/bagon/Trainer.py:46-63 shows the intent).
    """
    mask = (input_ids == pad_id).astype(jnp.float32)
    return jnp.mean(jnp.sum(mask, axis=-1) / mask.shape[-1] * 100.0)
