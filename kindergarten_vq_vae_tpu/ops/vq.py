"""Vector-quantization bottleneck — pure-jnp reference implementation.

Semantics parity with models/shelgon3/VectorQuantizer.py:31-93:

- pairwise L2 via ``|z|^2 + |e|^2 - 2 z @ e^T``      (VectorQuantizer.py:59-61)
- first-minimum argmin                               (:65; jnp.argmin also
  returns the first occurrence on ties, matching torch)
- ``z_q = one_hot @ E``                              (:67-72)
- loss ``mean((sg[z_q]-z)^2) + beta*mean((z_q-sg[z])^2)``  (:76-77)
- straight-through ``z_q = z + sg(z_q - z)``         (:80)
- codebook usage perplexity                          (:84-85)
- codebook init uniform ±1/n_e or injected k-means values  (:26-29)

This module is the correctness oracle for the fused Pallas kernel
(ops/vq_pallas.py). It also adds the EMA codebook-update path (van den Oord
et al. 2017 appendix), which the reference does not have but the build brief
requires (SURVEY §2.4 ⭐ note).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VQOutput(NamedTuple):
    loss: jnp.ndarray          # scalar commitment + codebook loss
    z_q: jnp.ndarray           # (B, S, D) straight-through quantized latents
    perplexity: jnp.ndarray    # scalar codebook usage perplexity
    one_hot: jnp.ndarray       # (B*S, n_e) hard assignments
    indices: jnp.ndarray       # (B, S, 1) code indices (reference shape, :90)
    counts: jnp.ndarray        # (n_e,) per-code assignment counts (EMA stats)
    sum_z: jnp.ndarray         # (n_e, D) per-code sum of z (EMA stats)


def vector_quantize(z: jnp.ndarray, codebook: jnp.ndarray, beta: float) -> VQOutput:
    """Quantize encoder output ``z`` (B, S, D) against ``codebook`` (n_e, D).

    Distances are computed on CENTERED values (codebook mean subtracted from
    both z and E): argmin over ``|z - e_k|^2`` is exactly invariant to a
    common shift, but the raw expansion ``|z|^2 + |e|^2 - 2 z.e`` loses all
    resolution when codes sit close together far from the origin — measured
    round 4: a trained bert-base encoder put rows at norm ~27.6 with
    centroids ~0.06 apart, so the z.e term (~764) needed differences of
    ~1.7 that the TPU's bf16 matmul passes (ulp 4 at that magnitude) cannot
    represent — every row tied to code 0 and codebook perplexity read 1.0.
    Centering makes magnitudes comparable to separations at any encoder
    amplitude. Gradients are unaffected (distances only feed argmin)."""
    batch, seq_len, d = z.shape
    n_e = codebook.shape[0]
    z_flat = z.reshape(-1, d)

    center = jax.lax.stop_gradient(jnp.mean(codebook, axis=0))
    zc = jax.lax.stop_gradient(z_flat) - center
    ec = codebook - center
    dist = (
        jnp.sum(zc**2, axis=1, keepdims=True)
        + jnp.sum(ec**2, axis=1)
        - 2.0 * zc @ ec.T
    )
    indices = jnp.argmin(dist, axis=1)
    one_hot = jax.nn.one_hot(indices, n_e, dtype=z.dtype)
    z_q = (one_hot @ codebook).reshape(z.shape)

    loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + beta * jnp.mean(
        (z_q - jax.lax.stop_gradient(z)) ** 2
    )

    z_q_ste = z + jax.lax.stop_gradient(z_q - z)

    e_mean = jnp.mean(one_hot, axis=0)
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))

    counts = jnp.sum(one_hot, axis=0)
    sum_z = one_hot.T @ jax.lax.stop_gradient(z_flat)

    return VQOutput(
        loss=loss,
        z_q=z_q_ste,
        perplexity=perplexity,
        one_hot=one_hot,
        indices=indices.reshape(batch, seq_len, 1),
        counts=counts,
        sum_z=sum_z,
    )


def init_codebook(key: jax.Array, n_e: int, e_dim: int, init_values=None) -> jnp.ndarray:
    """Uniform ±1/n_e init, or injected (k-means) values (VectorQuantizer.py:26-29)."""
    if init_values is not None:
        init_values = jnp.asarray(init_values)
        assert init_values.shape == (n_e, e_dim)
        return init_values
    return jax.random.uniform(key, (n_e, e_dim), minval=-1.0 / n_e, maxval=1.0 / n_e)


class EMAState(NamedTuple):
    counts: jnp.ndarray  # (n_e,) EMA of per-code assignment counts
    means: jnp.ndarray   # (n_e, D) EMA of per-code sums of z


def init_ema_state(codebook: jnp.ndarray) -> EMAState:
    n_e = codebook.shape[0]
    return EMAState(counts=jnp.ones((n_e,), codebook.dtype), means=codebook.copy())


def ema_codebook_update(
    codebook: jnp.ndarray,
    state: EMAState,
    counts: jnp.ndarray,
    sum_z: jnp.ndarray,
    decay: float = 0.99,
    eps: float = 1e-5,
) -> tuple[jnp.ndarray, EMAState]:
    """Exponential-moving-average codebook update (VQ-VAE appendix A.1).

    ``counts``/``sum_z`` are the per-batch stats from ``vector_quantize`` or
    the fused kernel. Laplace smoothing keeps dead codes from collapsing.
    """
    new_counts = decay * state.counts + (1.0 - decay) * counts
    new_means = decay * state.means + (1.0 - decay) * sum_z
    n = jnp.sum(new_counts)
    n_e = codebook.shape[0]
    smoothed = (new_counts + eps) / (n + n_e * eps) * n
    new_codebook = new_means / smoothed[:, None]
    return new_codebook, EMAState(counts=new_counts, means=new_means)


def kmeans_codebook_init(
    key: jax.Array, z_flat: jnp.ndarray, n_e: int, n_iters: int = 25
) -> jnp.ndarray:
    """K-means codebook initialization over encoder outputs.

    TPU-native replacement for the reference's offline
    ``scipy.cluster.vq.kmeans2(..., minit='points')``
    (models/shelgon3/vq_codebook_init_weights.py:76-85): distinct random
    points init, then Lloyd iterations — all jit-compiled, no host round-trip.
    """
    m = z_flat.shape[0]
    init_idx = jax.random.choice(key, m, (n_e,), replace=False)
    centroids = z_flat[init_idx]
    # assignments on data centered by the GLOBAL mean: Lloyd is exactly
    # shift-invariant, and a trained encoder puts all rows on a tight shell
    # far from the origin where the raw |z|^2+|c|^2-2 z.c expansion is
    # numerically blind (see vector_quantize) — uncentered, every Lloyd
    # iteration assigns by rounding noise and the init never improves.
    gmean = jnp.mean(z_flat, axis=0, keepdims=True)
    zc = z_flat - gmean

    def body(_, cent):
        cc = cent - gmean
        dist = (
            jnp.sum(zc**2, axis=1, keepdims=True)
            + jnp.sum(cc**2, axis=1)
            - 2.0 * zc @ cc.T
        )
        assign = jnp.argmin(dist, axis=1)
        oh = jax.nn.one_hot(assign, n_e, dtype=z_flat.dtype)
        counts = jnp.sum(oh, axis=0)
        sums = oh.T @ z_flat
        new_cent = sums / jnp.maximum(counts[:, None], 1.0)
        # keep empty clusters where they were (kmeans2 'points' behavior keeps
        # centroids stable when nothing is assigned)
        return jnp.where(counts[:, None] > 0, new_cent, cent)

    return jax.lax.fori_loop(0, n_iters, body, centroids)


def dead_code_reset(
    codebook: jnp.ndarray,
    dead_steps: jnp.ndarray,
    counts: jnp.ndarray,
    z_rows: jnp.ndarray,
    key: jax.Array,
    threshold: int = 100,
    noise_scale: float = 1e-3,
):
    """Dead-codebook revival (not in the reference; standard VQ-VAE practice
    addressing the index collapse measured in RESULTS.md).

    ``dead_steps`` (n_e,) counts consecutive steps with zero assignments;
    codes past ``threshold`` are re-seeded to random encoder outputs
    (``z_rows``: (m, D) candidates from the current batch) plus small noise.
    Returns (new_codebook, new_dead_steps).
    """
    n_e = codebook.shape[0]
    dead_steps = jnp.where(counts > 0, 0, dead_steps + 1)
    expired = dead_steps >= threshold

    key_pick, key_noise = jax.random.split(key)
    pick = jax.random.randint(key_pick, (n_e,), 0, z_rows.shape[0])
    replacements = z_rows[pick] + noise_scale * jax.random.normal(key_noise, codebook.shape, codebook.dtype)

    new_codebook = jnp.where(expired[:, None], replacements.astype(codebook.dtype), codebook)
    new_dead_steps = jnp.where(expired, 0, dead_steps)
    return new_codebook, new_dead_steps
