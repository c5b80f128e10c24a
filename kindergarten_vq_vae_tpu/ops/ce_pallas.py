"""Fused cross-entropy Pallas kernel (flash-style online logsumexp).

The reconstruction loss reduces a (B·S, 30522) logits matrix to per-row NLL.
The XLA path materializes an f32 copy of the logits for the reductions
(``convert_reduce`` fusions, ~19 ms/step at bert-base batch 1024 — RESULTS).
This kernel streams the bf16 logits once: a (rows, vocab-tile) grid with
running (max, sumexp, target-logit) accumulators in VMEM scratch, finalized
on the last vocab tile:

    nll[r] = (m[r] + log s[r]) - logit[r, target[r]]

The backward pass is a second single-read kernel emitting the fused
``(softmax - one_hot) * scale`` gradient tile by tile. Both compose into
``fused_ce_loss`` (custom VJP), a drop-in for train.losses.kl_recon_loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _ce_fwd_kernel(vocab: int, block_v: int, logits_ref, tgt_ref, nll_ref, m_s, s_s, t_s):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    chunk = logits_ref[:].astype(jnp.float32)  # (TR, TV)
    col = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 1) + j * block_v
    chunk = jnp.where(col < vocab, chunk, NEG_INF)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)
        t_s[:] = jnp.zeros_like(t_s)

    m_old = m_s[:, 0]                                   # (TR,)
    m_new = jnp.maximum(m_old, jnp.max(chunk, axis=1))
    corr = jnp.exp(m_old - m_new)
    s_s[:, 0] = s_s[:, 0] * corr + jnp.sum(jnp.exp(chunk - m_new[:, None]), axis=1)
    m_s[:, 0] = m_new

    tgt = tgt_ref[:, 0]                                 # (TR,) int32
    hit = (col == tgt[:, None]) & (col < vocab)
    t_s[:, 0] = t_s[:, 0] + jnp.sum(jnp.where(hit, chunk, 0.0), axis=1)

    @pl.when(j == n_j - 1)
    def _final():
        nll_ref[:, 0] = (m_s[:, 0] + jnp.log(s_s[:, 0])) - t_s[:, 0]


def _ce_fwd_ids_kernel(vocab: int, block_v: int, logits_ref, tgt_ref,
                       nll_ref, ids_ref, m_s, s_s, t_s, av_s, ai_s):
    """_ce_fwd_kernel + a running argmax, so recon ids come from the same
    single streaming read instead of a separate full-logits argmax pass."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    chunk = logits_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 1) + j * block_v
    chunk = jnp.where(col < vocab, chunk, NEG_INF)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)
        t_s[:] = jnp.zeros_like(t_s)
        av_s[:] = jnp.full_like(av_s, NEG_INF)
        ai_s[:] = jnp.zeros_like(ai_s)

    m_old = m_s[:, 0]
    m_new = jnp.maximum(m_old, jnp.max(chunk, axis=1))
    corr = jnp.exp(m_old - m_new)
    s_s[:, 0] = s_s[:, 0] * corr + jnp.sum(jnp.exp(chunk - m_new[:, None]), axis=1)
    m_s[:, 0] = m_new

    tgt = tgt_ref[:, 0]
    hit = (col == tgt[:, None]) & (col < vocab)
    t_s[:, 0] = t_s[:, 0] + jnp.sum(jnp.where(hit, chunk, 0.0), axis=1)

    tile_max = jnp.max(chunk, axis=1)
    tile_arg = jnp.argmax(chunk, axis=1).astype(jnp.int32) + j * block_v
    better = tile_max > av_s[:, 0]  # strict: first maximum wins (jnp.argmax)
    av_s[:, 0] = jnp.where(better, tile_max, av_s[:, 0])
    ai_s[:, 0] = jnp.where(better, tile_arg, ai_s[:, 0])

    @pl.when(j == n_j - 1)
    def _final():
        nll_ref[:, 0] = (m_s[:, 0] + jnp.log(s_s[:, 0])) - t_s[:, 0]
        ids_ref[:, 0] = ai_s[:, 0]


def _ce_bwd_kernel(vocab: int, block_v: int, logits_ref, tgt_ref, lse_ref, scale_ref, out_ref):
    j = pl.program_id(1)
    chunk = logits_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 1) + j * block_v
    p = jnp.exp(chunk - lse_ref[:, 0][:, None])
    onehot = (col == tgt_ref[:, 0][:, None]).astype(jnp.float32)
    g = (p - onehot) * scale_ref[:, 0][:, None]
    out_ref[:] = jnp.where(col < vocab, g, 0.0).astype(out_ref.dtype)


def _ce_pallas_fwd(logits2d, targets, block_r: int, block_v: int, interpret: bool):
    r, v = logits2d.shape
    r_pad = _round_up(max(r, block_r), block_r)
    grid_r = r_pad // block_r
    grid_v = pl.cdiv(v, block_v)
    if r_pad != r:
        logits2d = jnp.pad(logits2d, ((0, r_pad - r), (0, 0)))
        targets = jnp.pad(targets, (0, r_pad - r))
    tgt2d = targets[:, None].astype(jnp.int32)

    kernel = functools.partial(_ce_fwd_kernel, v, block_v)
    nll = pl.pallas_call(
        kernel,
        grid=(grid_r, grid_v),
        in_specs=[
            pl.BlockSpec((block_r, block_v), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
        ],
        interpret=interpret,
    )(logits2d, tgt2d)
    return nll[:r, 0]


def _ce_pallas_fwd_ids(logits2d, targets, block_r: int, block_v: int, interpret: bool):
    r, v = logits2d.shape
    r_pad = _round_up(max(r, block_r), block_r)
    grid_r = r_pad // block_r
    grid_v = pl.cdiv(v, block_v)
    if r_pad != r:
        logits2d = jnp.pad(logits2d, ((0, r_pad - r), (0, 0)))
        targets = jnp.pad(targets, (0, r_pad - r))
    tgt2d = targets[:, None].astype(jnp.int32)

    kernel = functools.partial(_ce_fwd_ids_kernel, v, block_v)
    row_spec = pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    nll, ids = pl.pallas_call(
        kernel,
        grid=(grid_r, grid_v),
        in_specs=[
            pl.BlockSpec((block_r, block_v), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(logits2d, tgt2d)
    return nll[:r, 0], ids[:r, 0]


def _ce_pallas_bwd(logits2d, targets, lse, scale, block_r: int, block_v: int, interpret: bool):
    r, v = logits2d.shape
    r_pad = _round_up(max(r, block_r), block_r)
    grid_r = r_pad // block_r
    grid_v = pl.cdiv(v, block_v)
    if r_pad != r:
        logits2d = jnp.pad(logits2d, ((0, r_pad - r), (0, 0)))
        targets = jnp.pad(targets, (0, r_pad - r))
        lse = jnp.pad(lse, (0, r_pad - r))
        scale = jnp.pad(scale, (0, r_pad - r))
    kernel = functools.partial(_ce_bwd_kernel, v, block_v)
    g = pl.pallas_call(
        kernel,
        grid=(grid_r, grid_v),
        in_specs=[
            pl.BlockSpec((block_r, block_v), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, block_v), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, v), logits2d.dtype),
        interpret=interpret,
    )(logits2d, targets[:, None].astype(jnp.int32), lse[:, None], scale[:, None])
    return g[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_ce_loss(logits, target_ids, valid_row, block_r: int = 256,
                  block_v: int = 2048, interpret: bool | None = None):
    """(B, S, V) logits + (B, S) targets -> scalar mean NLL.

    Value/gradient-identical to train.losses.kl_recon_loss (the reference's
    ``kl_div(log_softmax, one_hot, batchmean)`` form), streaming the logits
    in bf16 instead of materializing f32 reductions.
    """
    loss, _ = _fused_ce_fwd(logits, target_ids, valid_row, block_r, block_v, interpret)
    return loss


def _resolve_interpret(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


def _fused_ce_fwd(logits, target_ids, valid_row, block_r, block_v, interpret):
    interpret = _resolve_interpret(interpret)
    b, s, v = logits.shape
    logits2d = logits.reshape(-1, v)
    targets = target_ids.reshape(-1)
    nll = _ce_pallas_fwd(logits2d, targets, block_r, block_v, interpret)  # (B*S,)
    w = jnp.repeat(valid_row.astype(jnp.float32), s)
    denom = jnp.maximum(jnp.sum(valid_row.astype(jnp.float32)), 1.0) * s
    loss = jnp.sum(nll * w) / denom
    # lse = nll + target_logit; recompute in bwd via stored nll? store lse directly:
    # lse = m + log s; nll = lse - tgt -> lse = nll + tgt. Cheaper: recompute
    # tgt via gather in bwd? Store lse by deriving it here with one gather.
    tgt_logit = jnp.take_along_axis(logits2d, targets[:, None], axis=1)[:, 0].astype(jnp.float32)
    lse = nll + tgt_logit
    return loss, (logits2d, targets, lse, w, denom, (b, s, v))


def _fused_ce_bwd(block_r, block_v, interpret, res, g):
    interpret = _resolve_interpret(interpret)
    logits2d, targets, lse, w, denom, (b, s, v) = res
    scale = (g / denom) * w
    g2d = _ce_pallas_bwd(logits2d, targets, lse, scale, block_r, block_v, interpret)
    return g2d.reshape(b, s, v), None, None


fused_ce_loss.defvjp(_fused_ce_fwd, _fused_ce_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_ce_loss_ids(logits, target_ids, valid_row, block_r: int = 256,
                      block_v: int = 2048, interpret: bool | None = None):
    """``fused_ce_loss`` that also returns ``argmax(logits)`` from the same
    streaming read — kills the separate full-logits argmax pass the metrics
    path otherwise pays (another (B*S, V) HBM read per step)."""
    (loss, ids), _ = _fused_ce_ids_fwd(logits, target_ids, valid_row,
                                       block_r, block_v, interpret)
    return loss, ids


def _fused_ce_ids_fwd(logits, target_ids, valid_row, block_r, block_v, interpret):
    interpret = _resolve_interpret(interpret)
    b, s, v = logits.shape
    logits2d = logits.reshape(-1, v)
    targets = target_ids.reshape(-1)
    nll, ids = _ce_pallas_fwd_ids(logits2d, targets, block_r, block_v, interpret)
    w = jnp.repeat(valid_row.astype(jnp.float32), s)
    denom = jnp.maximum(jnp.sum(valid_row.astype(jnp.float32)), 1.0) * s
    loss = jnp.sum(nll * w) / denom
    tgt_logit = jnp.take_along_axis(logits2d, targets[:, None], axis=1)[:, 0].astype(jnp.float32)
    lse = nll + tgt_logit
    return (loss, ids.reshape(b, s)), (logits2d, targets, lse, w, denom, (b, s, v))


def _fused_ce_ids_bwd(block_r, block_v, interpret, res, cts):
    g, _ = cts  # ids are integer: no cotangent
    interpret = _resolve_interpret(interpret)
    logits2d, targets, lse, w, denom, (b, s, v) = res
    scale = (g / denom) * w
    g2d = _ce_pallas_bwd(logits2d, targets, lse, scale, block_r, block_v, interpret)
    return g2d.reshape(b, s, v), None, None


fused_ce_loss_ids.defvjp(_fused_ce_ids_fwd, _fused_ce_ids_bwd)
