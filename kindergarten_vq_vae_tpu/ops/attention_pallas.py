"""Fused multi-head attention Pallas kernel for tiny sequences.

Motivation (profiled, RESULTS.md): at dSentences lengths (S=12) the XLA
attention path is dominated by layout conversion — the (B, S, h, d) /
(B, h, S, S) intermediates are far below the (8, 128) tile minima, so ~17%
of the whole training step is pure data formatting and the attention
matmuls run at single-digit MXU utilization.

This kernel never materializes a head-split tensor. Per batch tile
(everything VMEM-resident):

    scores[b,i,h,j] = sum_d q[b,i,h,d] k[b,j,h,d]
                    = rowwise (q * broadcast(k_j)) @ SUM_h       (MXU)

where ``SUM_h`` is the constant (H, 128) block-diagonal head-sum matrix
(lane hh accumulates feature block hh·d..hh·d+d). The probabilities stay in
a (S_k, TB·S_q, 128) f32 scratch; the context re-expands with the transpose
constant ``EXP_h`` (128, H):

    ctx[b,i,h,:] = sum_j p[b,i,h,j] * v[b,j,h,:]
                 = sum_j (p_j @ EXP_h) * broadcast(v_j)           (MXU + VPU)

All tensors the kernel touches are (rows, 128·k)-shaped — native tiling, no
relayouts. The backward (custom VJP) recomputes probabilities from the
saved inputs (flash-style residuals).

Measured (TPU v5e, bert-base shape B=1024 S=12 h=12 d=64): ~1.27 ms/layer
forward vs ~1.23 ms for the XLA einsum path — parity, not a win. At this
shape both formulations are VPU/broadcast-bound (the per-key elementwise
q*k products dominate; the MXU matmuls are padded 12→128 lanes). The kernel
is kept as a building block: the projected round-2 win is fusing the WHOLE
transformer layer (qkv matmul + attention + out + LayerNorm) so the
(rows, H) activations never leave VMEM between ops — this kernel is that
mega-kernel's attention inner loop.

Scope: deterministic attention (no probability dropout) — callers should
use the XLA path when attention dropout is active or attention
probabilities are requested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
NEG_INF = -1e9


def _head_matrices(num_heads: int, head_dim: int, dtype):
    """(SUM_h, EXP_h) constants: (H, 128) block-sum and (128, H) expand."""
    h_pad = _LANES
    hidden = num_heads * head_dim
    sum_h = np.zeros((hidden, h_pad), np.float32)
    for hh in range(num_heads):
        sum_h[hh * head_dim : (hh + 1) * head_dim, hh] = 1.0
    return jnp.asarray(sum_h, dtype), jnp.asarray(sum_h.T, dtype)


def _mha_kernel(
    seq: int,
    num_heads: int,
    head_dim: int,
    causal: bool,
    has_mask: bool,
    block_b: int,
    # refs
    q_ref, k_ref, v_ref, mask_ref, sumh_ref, exph_ref, out_ref, scores,
):
    hidden = num_heads * head_dim
    rows = block_b * seq
    scale = 1.0 / float(np.sqrt(head_dim))

    q = q_ref[:].reshape(rows, hidden)  # (R, H) bf16

    # lane/row index helpers
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) % seq
    head_valid = lane < num_heads

    # ---- scores pass
    for j in range(seq):
        k_j = k_ref[:, j, :]  # (TB, H)
        k_b = jnp.broadcast_to(k_j[:, None, :], (block_b, seq, hidden)).reshape(rows, hidden)
        prod = (q * k_b)
        s_j = jax.lax.dot_general(
            prod, sumh_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (R, 128) lanes=heads
        s_j = s_j * scale
        if causal:
            s_j = jnp.where(qpos >= j, s_j, NEG_INF)
        if has_mask:
            kv = mask_ref[:, j]  # (TB,)
            kv_rows = jnp.broadcast_to(kv[:, None, None], (block_b, seq, 1)).reshape(rows, 1)
            s_j = jnp.where(kv_rows > 0, s_j, NEG_INF)
        s_j = jnp.where(head_valid, s_j, NEG_INF)
        scores[j] = s_j

    # ---- softmax over j (the leading scratch axis)
    m = scores[0]
    for j in range(1, seq):
        m = jnp.maximum(m, scores[j])
    z = jnp.zeros_like(m)
    for j in range(seq):
        e = jnp.exp(scores[j] - m)
        scores[j] = e
        z = z + e
    inv_z = 1.0 / z

    # ---- context pass
    acc = jnp.zeros((rows, hidden), jnp.float32)
    for j in range(seq):
        p_j = (scores[j] * inv_z).astype(q_ref.dtype)  # (R, 128)
        p_exp = jax.lax.dot_general(
            p_j, exph_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (R, H)
        v_j = v_ref[:, j, :]
        v_b = jnp.broadcast_to(v_j[:, None, :], (block_b, seq, hidden)).reshape(rows, hidden)
        acc = acc + p_exp * v_b.astype(jnp.float32)

    out_ref[:] = acc.reshape(block_b, seq, hidden).astype(out_ref.dtype)


def _mha_forward(q, k, v, mask, num_heads: int, causal: bool, block_b: int, interpret: bool):
    b, seq, hidden = q.shape
    head_dim = hidden // num_heads
    assert hidden % num_heads == 0
    assert num_heads <= _LANES, "head-lane packing supports up to 128 heads"

    block_b = min(block_b, b)
    b_pad = ((b + block_b - 1) // block_b) * block_b
    if b_pad != b:
        padn = b_pad - b
        q = jnp.pad(q, ((0, padn), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, padn), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, padn), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, padn), (0, 0)), constant_values=1)

    has_mask = mask is not None
    if mask is None:
        mask = jnp.ones((b_pad, seq), jnp.int32)

    sum_h, exp_h = _head_matrices(num_heads, head_dim, q.dtype)
    kernel = functools.partial(
        _mha_kernel, seq, num_heads, head_dim, causal, has_mask, block_b
    )
    grid = b_pad // block_b
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_b, seq, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANES, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, seq, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, seq, hidden), q.dtype),
        scratch_shapes=[pltpu.VMEM((seq, block_b * seq, _LANES), jnp.float32)],
        interpret=interpret,
    )(q, k, v, mask.astype(jnp.int32), sum_h, exp_h)
    return out[:b]


def _mha_reference(q, k, v, mask, num_heads: int, causal: bool):
    """XLA reference (the module's existing formulation) for tests/VJP."""
    b, s, hidden = q.shape
    d = hidden // num_heads
    qh = q.reshape(b, s, num_heads, d)
    kh = k.reshape(b, s, num_heads, d)
    vh = v.reshape(b, s, num_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
    if causal:
        cm = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(cm[None, None], scores, NEG_INF)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :] > 0, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return ctx.reshape(b, s, hidden)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_mha(q, k, v, mask, num_heads: int, causal: bool = False,
              block_b: int = 64, interpret: bool | None = None):
    """Fused tiny-seq MHA. q/k/v: (B, S, H); mask: (B, S_k) or None.

    Value- and gradient-parity-tested against the einsum reference
    (tests/test_attention_pallas.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mha_forward(q, k, v, mask, num_heads, causal, block_b, interpret)


def _fused_mha_fwd(q, k, v, mask, num_heads, causal, block_b, interpret):
    out = fused_mha(q, k, v, mask, num_heads, causal, block_b, interpret)
    return out, (q, k, v, mask)


def _fused_mha_bwd(num_heads, causal, block_b, interpret, res, g):
    # flash-style: recompute probabilities, then standard softmax backward.
    # XLA handles this cleanly at backward time because the expensive part
    # (materializing p) reuses the same reference formulation; the fwd is
    # where the kernel's fusion pays during inference-heavy workloads.
    q, k, v, mask = res

    def ref(q_, k_, v_):
        return _mha_reference(q_, k_, v_, mask, num_heads, causal)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)
