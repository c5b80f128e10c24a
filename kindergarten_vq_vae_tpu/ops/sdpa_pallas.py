"""Block-diagonal fused SDPA Pallas kernels for tiny sequences (fwd + bwd).

The round-1 profile showed the training step is dominated by the attention
blocks: at dSentences lengths (S=12) XLA's (B, S, h, d)/(B, h, S, S)
intermediates sit far below the (8, 128) tile minima, so the step pays ~17%
pure layout conversion plus low-MXU matmuls — in BOTH directions (the
backward is ~60% of step time). The earlier head-lane-packed kernel
(ops/attention_pallas.py) removed the layouts but was broadcast-bound and
only reached XLA parity, and its backward still fell back to XLA.

This kernel uses a different formulation with no broadcasts at all: pack a
tile of TB sentences into a (rows, H) = (TB*S, H) activation and compute,
per head, dense (rows x rows) scores

    s = q_h @ k_h^T          (MXU, rows aligned to tiles)

with a block-diagonal sentence mask (row//S == col//S) + causal + key-mask
folded into one additive bias built once per tile. Cross-sentence entries
are wasted FLOPs (rows/S per valid), but they run at full MXU utilization
and rows stays small (default TB=64 -> rows=768); the wasted work is orders
of magnitude cheaper than the layout conversions it replaces. Softmax and
the probability matmuls stay VMEM-resident; nothing head-split ever touches
HBM. The BACKWARD is the same structure (5 small MXU matmuls per head) in a
second Pallas kernel — this is the part XLA could not do well.

Attention-probability dropout (needed for train parity with the reference's
HF stack, hidden/attention dropout 0.1) runs inside the kernel with a
counter-based hash (murmur3 fmix32 of global-row/key-pos/head/seed): pure
integer VPU ops, bit-identical in compiled and interpret modes, and
trivially identical between forward and backward (same formula, no PRNG
state or draw-order coupling).

Semantics anchor: the reference's attention is HF BertSelfAttention
(consumed via models/bagon/Bagon.py:40-55); the jnp oracle it is tested
against is nn/bert.py's einsum formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # finite (HF-style) so fully-masked rows stay NaN-free


def _tile_geometry(tb: int, s_q: int, s_k: int):
    """Block-diagonal index helpers WITHOUT integer div/mod (slow on the VPU):
    sentence id and query position come from 3D iotas collapsed over the
    leading dims (a supported sublane-merge reshape)."""
    rows_q, rows_k = tb * s_q, tb * s_k
    b_id = jax.lax.broadcasted_iota(jnp.int32, (tb, s_q, rows_k), 0).reshape(rows_q, rows_k)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (tb, s_q, rows_k), 1).reshape(rows_q, rows_k)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows_q, rows_k), 1)
    kpos = c - b_id * s_k  # within-block key position (garbage off-block)
    return qpos, kpos


def _tile_bias(mask_ref, qpos, kpos, tb: int, s_q: int, s_k: int, causal: bool):
    """(rows_q, rows_k) additive bias: block-diagonal + causal + key mask."""
    rows_q, rows_k = tb * s_q, tb * s_k
    ok = (kpos >= 0) & (kpos < s_k)
    if causal:
        ok &= qpos >= kpos
    # key mask arrives pre-flattened as a (1, rows_k) block (Mosaic cannot
    # shape-cast (TB, S_k) -> (1, rows_k) in-kernel)
    kv = mask_ref[0]  # (1, rows_k)
    ok &= jnp.broadcast_to(kv > 0, (rows_q, rows_k))
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)



def _dropout_keep_scale(seed, tile, h, kpos, tb, s_q, s_k, rate):
    """(rows_q, rows_k) f32: 1/(1-rate) where kept, 0 where dropped.

    Counter-based: murmur3-style fmix of (global row id, key position, head,
    seed). Only block-diagonal entries matter (p is 0 elsewhere), so the key
    coordinate is the within-block position ``kpos``. The row/seed/head term
    is rank-1 (varies along rows only), so the full-shape work is one xor +
    the 2-multiply finalizer."""
    rows_q, rows_k = tb * s_q, tb * s_k
    gr = (
        jax.lax.broadcasted_iota(jnp.uint32, (rows_q, 128), 0)[:, :1]
        + jnp.uint32(rows_q) * tile.astype(jnp.uint32)
    )
    row_term = gr * jnp.uint32(0x9E3779B1) + (
        seed.astype(jnp.uint32) + jnp.uint32(h) * jnp.uint32(0xC2B2AE3D)
    )  # (rows_q, 1)
    x = row_term ^ (kpos.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    thresh = np.uint32(min(rate, 1.0) * float(2**32 - 1))
    return jnp.where(x >= thresh, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _sdpa_fwd_kernel(
    num_heads: int, head_dim: int, tb: int, s_q: int, s_k: int,
    causal: bool, rate: float,
    seed_ref, q_ref, k_ref, v_ref, mask_ref, out_ref,
):
    rows_q, rows_k = tb * s_q, tb * s_k
    hidden = num_heads * head_dim
    scale = 1.0 / float(np.sqrt(head_dim))

    q2 = q_ref[:].reshape(rows_q, hidden)
    k2 = k_ref[:].reshape(rows_k, hidden)
    v2 = v_ref[:].reshape(rows_k, hidden)
    qpos, kpos = _tile_geometry(tb, s_q, s_k)
    bias = _tile_bias(mask_ref, qpos, kpos, tb, s_q, s_k, causal)

    parts = []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q2[:, sl], k2[:, sl], v2[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        z = jnp.sum(e, axis=1, keepdims=True)
        p = e / z
        if rate > 0.0:
            p = p * _dropout_keep_scale(
                seed_ref[0], pl.program_id(0), h, kpos, tb, s_q, s_k, rate
            )
        ctx = jax.lax.dot_general(
            p.astype(v2.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        parts.append(ctx)
    out = jnp.concatenate(parts, axis=1)
    out_ref[:] = out.reshape(tb, s_q, hidden).astype(out_ref.dtype)


def _sdpa_bwd_kernel(
    num_heads: int, head_dim: int, tb: int, s_q: int, s_k: int,
    causal: bool, rate: float,
    seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref, dq_ref, dk_ref, dv_ref,
):
    rows_q, rows_k = tb * s_q, tb * s_k
    hidden = num_heads * head_dim
    scale = 1.0 / float(np.sqrt(head_dim))

    q2 = q_ref[:].reshape(rows_q, hidden)
    k2 = k_ref[:].reshape(rows_k, hidden)
    v2 = v_ref[:].reshape(rows_k, hidden)
    g2 = g_ref[:].reshape(rows_q, hidden).astype(jnp.float32)
    qpos, kpos = _tile_geometry(tb, s_q, s_k)
    bias = _tile_bias(mask_ref, qpos, kpos, tb, s_q, s_k, causal)

    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q2[:, sl], k2[:, sl], v2[:, sl]
        gh = g2[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        z = jnp.sum(e, axis=1, keepdims=True)
        p = e / z
        if rate > 0.0:
            kappa = _dropout_keep_scale(
                seed_ref[0], pl.program_id(0), h, kpos, tb, s_q, s_k, rate
            )
            pd = p * kappa
        else:
            pd = p
        # dv = pd^T @ g_h ; dpd = g_h @ v_h^T
        dv_h = jax.lax.dot_general(
            pd.astype(v2.dtype), gh.astype(v2.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpd = jax.lax.dot_general(
            gh.astype(v2.dtype), vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = dpd * kappa if rate > 0.0 else dpd
        t = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = p * (dp - t) * scale  # zero on masked entries since p == 0 there
        ds_c = ds.astype(q2.dtype)
        dq_h = jax.lax.dot_general(
            ds_c, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_h = jax.lax.dot_general(
            ds_c, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_parts.append(dq_h)
        dk_parts.append(dk_h)
        dv_parts.append(dv_h)

    dq_ref[:] = jnp.concatenate(dq_parts, axis=1).reshape(tb, s_q, hidden).astype(dq_ref.dtype)
    dk_ref[:] = jnp.concatenate(dk_parts, axis=1).reshape(tb, s_k, hidden).astype(dk_ref.dtype)
    dv_ref[:] = jnp.concatenate(dv_parts, axis=1).reshape(tb, s_k, hidden).astype(dv_ref.dtype)


def _pad_batch(arrs, mask, b, tb):
    b_pad = ((b + tb - 1) // tb) * tb
    if b_pad != b:
        padn = b_pad - b
        arrs = [jnp.pad(a, ((0, padn), (0, 0), (0, 0))) for a in arrs]
        mask = jnp.pad(mask, ((0, padn), (0, 0)), constant_values=1)
    return arrs, mask, b_pad


def _specs(tb, s_q, s_k, hidden):
    qspec = pl.BlockSpec((tb, s_q, hidden), lambda i, seed: (i, 0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((tb, s_k, hidden), lambda i, seed: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, tb * s_k), lambda i, seed: (i, 0, 0), memory_space=pltpu.VMEM)
    return qspec, kspec, mspec


def _resolve_interpret(interpret):
    import jax as _jax

    return _jax.default_backend() != "tpu" if interpret is None else interpret


def _sdpa_forward(q, k, v, mask, seed, num_heads, causal, rate, tb, interpret):
    interpret = _resolve_interpret(interpret)
    b, s_q, hidden = q.shape
    s_k = k.shape[1]
    head_dim = hidden // num_heads
    tb = min(tb, b)
    (q, k, v), mask, b_pad = _pad_batch([q, k, v], mask, b, tb)
    grid = b_pad // tb
    qspec, kspec, mspec = _specs(tb, s_q, s_k, hidden)
    kernel = functools.partial(
        _sdpa_fwd_kernel, num_heads, head_dim, tb, s_q, s_k, causal, rate
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[qspec, kspec, kspec, mspec],
            out_specs=qspec,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_q, hidden), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # default scoped cap is 16MB; v5e has 128MB
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_pad * s_q * (tb * s_k) * hidden,
            bytes_accessed=(2 * b_pad * s_q + 2 * b_pad * s_k) * hidden * q.dtype.itemsize,
            transcendentals=b_pad * s_q * tb * s_k * num_heads,
        ),
    )(seed, q, k, v, mask.astype(jnp.int32).reshape(grid, 1, tb * s_k))
    return out[:b]


def _sdpa_backward(q, k, v, mask, seed, g, num_heads, causal, rate, tb, interpret):
    interpret = _resolve_interpret(interpret)
    b, s_q, hidden = q.shape
    s_k = k.shape[1]
    head_dim = hidden // num_heads
    tb = min(tb, b)
    (q, k, v, g), mask, b_pad = _pad_batch([q, k, v, g], mask, b, tb)
    grid = b_pad // tb
    qspec, kspec, mspec = _specs(tb, s_q, s_k, hidden)
    kernel = functools.partial(
        _sdpa_bwd_kernel, num_heads, head_dim, tb, s_q, s_k, causal, rate
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[qspec, kspec, kspec, mspec, qspec],
            out_specs=[qspec, kspec, kspec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, s_q, hidden), q.dtype),
            jax.ShapeDtypeStruct((b_pad, s_k, hidden), k.dtype),
            jax.ShapeDtypeStruct((b_pad, s_k, hidden), v.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b_pad * s_q * (tb * s_k) * hidden,
            bytes_accessed=(5 * b_pad * s_q + 4 * b_pad * s_k) * hidden * q.dtype.itemsize,
            transcendentals=b_pad * s_q * tb * s_k * num_heads,
        ),
    )(seed, q, k, v, mask.astype(jnp.int32).reshape(grid, 1, tb * s_k), g)
    return dq[:b], dk[:b], dv[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_sdpa(
    q, k, v, mask, seed,
    num_heads: int, causal: bool = False, rate: float = 0.0,
    block_b: int = 64, interpret: bool | None = None,
):
    """Fused block-diagonal SDPA: q (B,S_q,H), k/v (B,S_k,H) -> (B,S_q,H).

    ``mask``: (B, S_k) key-validity ints or None. ``seed``: (1,) int32 for
    in-kernel attention-prob dropout (ignored when rate == 0). Cross-attention
    is the S_q != S_k case with causal=False. Gradients flow to q/k/v only.
    """
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[1]), jnp.int32)
    return _sdpa_forward(q, k, v, mask, seed, num_heads, causal, rate, block_b, interpret)


def _fused_sdpa_fwd(q, k, v, mask, seed, num_heads, causal, rate, block_b, interpret):
    out = fused_sdpa(q, k, v, mask, seed, num_heads, causal, rate, block_b, interpret)
    return out, (q, k, v, mask, seed)


def _fused_sdpa_bwd(num_heads, causal, rate, block_b, interpret, res, g):
    q, k, v, mask, seed = res
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[1]), jnp.int32)
    dq, dk, dv = _sdpa_backward(
        q, k, v, mask, seed, g, num_heads, causal, rate, block_b, interpret
    )
    return dq, dk, dv, None, None


fused_sdpa.defvjp(_fused_sdpa_fwd, _fused_sdpa_bwd)
