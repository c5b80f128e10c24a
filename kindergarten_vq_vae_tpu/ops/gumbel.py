"""Gumbel-softmax sampling + Gumbel codebook quantizer, functionalized.

Parity notes:
- ``gumbel_softmax`` matches ``torch.nn.functional.gumbel_softmax``:
  ``softmax((logits + Gumbel(0,1))/tau)``; ``hard=True`` returns the one-hot
  of the argmax with a straight-through gradient.
- ``gumbel_quantize`` matches models/shelgon3/GumbelQuantizer.py:43-83:
  Conv1d(enc_out -> n_embed, k=1) projection (a k=1 conv over channels is a
  dense along the feature axis), gumbel-softmax over the code axis, codebook
  mix-in via einsum, KL-to-uniform-prior regularizer, and the
  force-hard-in-eval rule (:53).

All randomness is threaded via explicit PRNG keys (SURVEY §7 hard-part 3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def gumbel_softmax(
    key: jax.Array,
    logits: jnp.ndarray,
    tau: float = 1.0,
    hard: bool = False,
    axis: int = -1,
) -> jnp.ndarray:
    gumbels = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], dtype=logits.dtype, axis=axis)
    return y_soft + jax.lax.stop_gradient(y_hard - y_soft)


class GumbelQuantizeOutput(NamedTuple):
    z_q: jnp.ndarray        # (B, S, D)
    diff: jnp.ndarray       # scalar KL-to-uniform regularizer
    indices: jnp.ndarray    # (B, S) code indices
    soft_one_hot: jnp.ndarray  # (B, n_embed, S)


def gumbel_quantize(
    key: jax.Array,
    z: jnp.ndarray,
    proj_kernel: jnp.ndarray,
    proj_bias: jnp.ndarray,
    codebook: jnp.ndarray,
    temperature: float,
    kl_div_scale: float,
    straight_through: bool,
    is_training: bool,
) -> GumbelQuantizeOutput:
    """Gumbel codebook quantizer.

    ``z`` (B, S, E); ``proj_kernel`` (E, n_embed), ``proj_bias`` (n_embed,)
    — the k=1 Conv1d of GumbelQuantizer.py:40 expressed as a dense;
    ``codebook`` (n_embed, D).
    """
    n_embed = codebook.shape[0]
    # logits over codes per position: (B, n_embed, S) to mirror the
    # reference's channel-first layout (GumbelQuantizer.py:56)
    logits = jnp.einsum("bse,en->bns", z, proj_kernel) + proj_bias[None, :, None]

    # force hard quantization in eval mode (GumbelQuantizer.py:53)
    hard = straight_through if is_training else True
    soft_one_hot = gumbel_softmax(key, logits, tau=temperature, hard=hard, axis=1)

    z_q = jnp.einsum("bns,nd->bsd", soft_one_hot, codebook)

    qy = jax.nn.softmax(logits, axis=1)
    diff = kl_div_scale * jnp.mean(
        jnp.sum(qy * jnp.log(qy * n_embed + 1e-10), axis=1)
    )

    indices = jnp.argmax(soft_one_hot, axis=1)
    return GumbelQuantizeOutput(z_q=z_q, diff=diff, indices=indices, soft_one_hot=soft_one_hot)


def unique_count_perplexity(indices: jnp.ndarray, n_embed: int) -> jnp.ndarray:
    """Number of distinct codes used — the reference's Gumbel 'perplexity'
    proxy (models/shelgon3/Shelgon.py:65), computed on-device instead of via
    a host round-trip (`torch.unique(....cpu())`)."""
    counts = jnp.zeros((n_embed,), jnp.int32).at[indices.reshape(-1)].add(1)
    return jnp.sum(counts > 0).astype(jnp.float32)
