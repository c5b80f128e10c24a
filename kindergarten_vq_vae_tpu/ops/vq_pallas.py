"""Fused Pallas TPU kernel for the VQ-VAE bottleneck.

One VMEM-resident pass over the encoder output fuses everything the
reference does in five separate torch ops (models/shelgon3/VectorQuantizer.py:59-85):

    distances -> argmin -> one-hot -> z_q gather (one-hot @ E)
    -> commitment/codebook loss partials -> usage counts (perplexity)
    -> per-code sums of z (EMA codebook-update statistics)

Rationale (pallas_guide.md): the op is HBM-bandwidth-bound on ``z`` —
(B*S, 768) vs a tiny codebook (n_e ~ 9). The XLA/jnp reference reads ``z``
from HBM for the distance matmul, again for the loss, again for the
straight-through output, and materializes the (B*S, n_e) one-hot. The fused
kernel streams each ``z`` tile through VMEM exactly once and keeps every
intermediate (distances, one-hot, partial reductions) on-chip.

Gradients are a custom VJP implementing the straight-through estimator
(VectorQuantizer.py:76-80):
    dz = g_zq + g_loss * 2 (z - zq_raw) / numel          (STE + commit term)
    dE = g_loss * 2 beta / numel * scatter_add(zq_raw - z)  (codebook term)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kindergarten_vq_vae_tpu.ops.vq import VQOutput

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vq_kernel(n_e: int, block_rows: int, m_ref, z_ref, e_ref, zq_ref, idx_ref, counts_ref, sumz_ref, diff_ref):
    i = pl.program_id(0)
    np_lanes = e_ref.shape[0]

    z = z_ref[:]                       # (TM, D) f32
    e = e_ref[:]                       # (NP, D) f32

    # ||z||^2 + ||e||^2 - 2 z e^T   (VectorQuantizer.py:59-61), computed on
    # CENTERED values (codebook mean subtracted from both sides): argmin is
    # shift-invariant, but the raw expansion loses all resolution when the
    # codes sit close together far from the origin (measured round 4: a
    # trained bert-base encoder at row norm ~27.6 with centroids ~0.06
    # apart needs distance differences ~100x below the matmul magnitude —
    # see ops/vq.vector_quantize). zq/sumz/diff below use the RAW values.
    rowi = jax.lax.broadcasted_iota(jnp.int32, e.shape, 0)
    c = jnp.sum(jnp.where(rowi < n_e, e, 0.0), axis=0, keepdims=True) / n_e
    zc = z - c
    ec = e - c
    zsq = jnp.sum(zc * zc, axis=1, keepdims=True)                # (TM, 1)
    esq = jnp.sum(ec * ec, axis=1)[None, :]                      # (1, NP)
    cross = jax.lax.dot_general(
        zc, ec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                            # (TM, NP)
    d = zsq + esq - 2.0 * cross

    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(lane < n_e, d, jnp.float32(jnp.inf))
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)                # (TM,) first-min

    row = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    valid = (i * block_rows + row) < m_ref[0]                    # (TM, 1) row mask

    one_hot = jnp.where((lane == idx[:, None]) & valid, 1.0, 0.0)  # (TM, NP)

    zq = jax.lax.dot_general(
        one_hot, e, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                            # (TM, D)

    zq_ref[:] = zq
    idx_ref[:] = idx[:, None]

    @pl.when(i == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sumz_ref[:] = jnp.zeros_like(sumz_ref)
        diff_ref[0, 0] = jnp.float32(0.0)

    counts_ref[:] += jnp.sum(one_hot, axis=0, keepdims=True)     # (1, NP)
    sumz_ref[:] += jax.lax.dot_general(
        one_hot, z, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                            # (NP, D)
    diff_ref[0, 0] += jnp.sum((zq - z) ** 2 * valid.astype(jnp.float32))


def _vq_forward_pallas(z_flat, codebook, block_rows: int, interpret: bool):
    m, d = z_flat.shape
    n_e = codebook.shape[0]
    np_lanes = _round_up(max(n_e, _LANES), _LANES)
    m_pad = _round_up(max(m, block_rows), block_rows)

    z_p = jnp.pad(z_flat.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    e_p = jnp.pad(codebook.astype(jnp.float32), ((0, np_lanes - n_e), (0, 0)))
    m_arr = jnp.asarray([m], jnp.int32)

    grid = m_pad // block_rows
    kernel = functools.partial(_vq_kernel, n_e, block_rows)

    zq_pad, idx_pad, counts, sumz, diff = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block_rows, d), lambda i, m_ref: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((np_lanes, d), lambda i, m_ref: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_rows, d), lambda i, m_ref: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, 1), lambda i, m_ref: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_lanes), lambda i, m_ref: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((np_lanes, d), lambda i, m_ref: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, np_lanes), jnp.float32),
            jax.ShapeDtypeStruct((np_lanes, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * d * np_lanes * 2,
            bytes_accessed=m_pad * d * 4 * 2 + np_lanes * d * 4,
            transcendentals=0,
        ),
    )(m_arr, z_p, e_p)

    return (
        zq_pad[:m],
        idx_pad[:m, 0],
        counts[0, :n_e],
        sumz[:n_e],
        diff[0, 0],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_vq_core(z_flat, codebook, block_rows: int, interpret: bool):
    """Returns (z_q_ste, diff1, diff2, idx, counts, sumz).

    ``diff1``/``diff2`` are numerically identical sums of (z_q - z)^2 but
    carry the two distinct gradient paths of the VQ loss
    (VectorQuantizer.py:76-77):
        diff1 ~ sum((sg[z_q] - z)^2):  d/dz = 2(z - z_q),  d/dE = 0
        diff2 ~ sum((z_q - sg[z])^2):  d/dz = 0,           d/dE = 2(z_q - z) scattered
    All scaling/reduction (1/numel, +beta, cross-device sums) happens in the
    caller with ordinary differentiable ops, so the kernel composes cleanly
    with shard_map / GSPMD without custom collective handling in the VJP.
    """
    zq_raw, idx, counts, sumz, diff = _vq_forward_pallas(z_flat, codebook, block_rows, interpret)
    z_q_ste = z_flat + (zq_raw - z_flat)  # gradient defined by custom VJP below
    return z_q_ste, diff, diff, idx, counts, sumz


def _fused_vq_core_fwd(z_flat, codebook, block_rows, interpret):
    out = _fused_vq_core(z_flat, codebook, block_rows, interpret)
    idx = out[3]
    return out, (z_flat, codebook, idx)


def _fused_vq_core_bwd(block_rows, interpret, res, cotangents):
    z_flat, codebook, idx = res
    g_zq, g_d1, g_d2, _, _, _ = cotangents
    zq_raw = codebook[idx]
    dz = g_zq + g_d1 * 2.0 * (z_flat - zq_raw)
    de = jax.ops.segment_sum(
        g_d2 * 2.0 * (zq_raw - z_flat), idx, num_segments=codebook.shape[0]
    )
    return dz, de.astype(codebook.dtype)


_fused_vq_core.defvjp(_fused_vq_core_fwd, _fused_vq_core_bwd)


def fused_vector_quantize(
    z: jnp.ndarray,
    codebook: jnp.ndarray,
    beta: float,
    block_rows: int = 512,
    interpret: bool | None = None,
) -> VQOutput:
    """Drop-in fused replacement for ops.vq.vector_quantize.

    Returns the same VQOutput contract (loss, STE z_q, perplexity, one-hot,
    (B,S,1) indices, EMA stats). ``one_hot`` is reconstructed from indices
    outside the kernel (XLA fuses or DCEs it when unused). For explicit
    data-parallel execution use ``fused_vector_quantize_sharded``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq_len, dim = z.shape
    n_e = codebook.shape[0]
    z_flat = z.reshape(-1, dim).astype(jnp.float32)

    # shrink the tile for small inputs so tiny batches don't pay for padding
    rows = min(block_rows, _round_up(z_flat.shape[0], 8))

    z_q, d1, d2, idx, counts, sumz = _fused_vq_core(z_flat, codebook, rows, interpret)
    numel = z_flat.size
    # value parity: mean((sg[zq]-z)^2) + beta*mean((zq-sg[z])^2)
    loss = (d1 + beta * d2) / numel

    total = jnp.asarray(z_flat.shape[0], jnp.float32)
    e_mean = counts / total
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
    one_hot = jax.nn.one_hot(idx, n_e, dtype=z_q.dtype)

    return VQOutput(
        loss=loss,
        z_q=z_q.reshape(z.shape),
        perplexity=perplexity,
        one_hot=one_hot,
        indices=idx.reshape(batch, seq_len, 1),
        counts=counts,
        sum_z=sumz,
    )


def fused_vector_quantize_sharded(
    z: jnp.ndarray,
    codebook: jnp.ndarray,
    beta: float,
    mesh,
    dp_axis: str = "dp",
    block_rows: int = 512,
    interpret: bool | None = None,
) -> VQOutput:
    """Data-parallel fused VQ: shard_map over ``dp_axis`` so each device runs
    the Pallas kernel on its local batch shard (instead of GSPMD replicating
    the kernel via all-gather). Per-shard partial sums come back stacked and
    are reduced with ordinary differentiable ops, so gradients flow through
    the standard shard_map transpose — no collectives inside the VJP.

    z_q/one_hot/indices are returned dp-sharded; loss/perplexity/counts/
    sum_z are global.
    """
    from jax.sharding import PartitionSpec as P

    from kindergarten_vq_vae_tpu.parallel.mesh import shard_map_nocheck

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq_len, dim = z.shape
    n_e = codebook.shape[0]

    def local(z_, e_):
        zf = z_.reshape(-1, dim).astype(jnp.float32)
        rows = min(block_rows, _round_up(zf.shape[0], 8))
        z_q, d1, d2, idx, counts, sumz = _fused_vq_core(zf, e_, rows, interpret)
        # add a leading per-shard axis for the stacked out_specs
        return (
            z_q.reshape(z_.shape),
            d1[None],
            d2[None],
            idx.reshape(z_.shape[0], seq_len),
            counts[None],
            sumz[None],
        )

    out_specs = (P(dp_axis), P(dp_axis), P(dp_axis), P(dp_axis), P(dp_axis), P(dp_axis))
    mapped = shard_map_nocheck(
        local, mesh=mesh, in_specs=(P(dp_axis), P()), out_specs=out_specs,
    )
    z_q, d1s, d2s, idx, counts_s, sumz_s = mapped(z, codebook)

    numel = z.size
    loss = (jnp.sum(d1s) + beta * jnp.sum(d2s)) / numel
    counts = jnp.sum(counts_s, axis=0)
    sumz = jnp.sum(sumz_s, axis=0)
    total = jnp.asarray(batch * seq_len, jnp.float32)
    e_mean = counts / total
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
    one_hot = jax.nn.one_hot(idx.reshape(-1), n_e, dtype=z_q.dtype)

    return VQOutput(
        loss=loss,
        z_q=z_q,
        perplexity=perplexity,
        one_hot=one_hot,
        indices=idx.reshape(batch, seq_len, 1),
        counts=counts,
        sum_z=sumz,
    )
