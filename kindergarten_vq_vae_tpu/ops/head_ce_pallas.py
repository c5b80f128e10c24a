"""Fused MLM-head + cross-entropy + argmax Pallas kernels.

The reconstruction loss path of every variant ends in the same three ops
over a (B*S, 30522) logits matrix (ref models/bagon/Trainer.py:103-110):

    logits = hidden @ E^T + b        # MLM head vocab projection
    loss   = mean NLL(logits, tgt)   # kl_div(log_softmax, one_hot) form
    ids    = argmax(logits)          # recon ids for seq_acc / decode dumps

At bert-base batch 2048 the logits matrix is 1.5 GB in bf16, and the XLA
path pays for it repeatedly: the head matmul writes it, the CE kernel reads
it, the argmax reads it again, the CE backward reads it + writes the same-
sized softmax gradient, and the two head-backward matmuls read that gradient
twice (~10.5 GB of HBM for ~3.45 TF of useful FLOPs). This module fuses the
whole segment into row-tile x vocab-tile grids with two materialization
policies, because on TPU the right choice is a FLOP:byte tradeoff:

- ``mode="store"``: the forward kernel computes each logits tile on the MXU
  and reduces it online (logsumexp + target gather + running argmax) while
  also writing the bf16 tile out once. Backward reads the stored logits,
  emits the fused ``(softmax - one_hot) * scale`` gradient tile, accumulates
  ``dx += g @ E_tile`` in VMEM f32, and writes per-row-tile bias-gradient
  partials. No recompute; saves the separate CE-read, argmax-read and
  dx-gradient-read passes (~4.5 GB/step at batch 2048).
- ``mode="flash"``: identical, but the forward never writes logits to HBM at
  all; the backward recomputes each tile from (x, E). Trades ~3 GB of HBM
  traffic for 1.15 TF of MXU recompute — on v5e's FLOP:byte ratio that is
  roughly a wash at bert-base shape, so both modes exist and RESULTS.md
  records the measured winner.

Both modes return ``(loss, recon_ids)`` so the metrics path needs no logits
either. The gradient w.r.t. the (tied) embedding table is ONE plain XLA
matmul over the materialized softmax-gradient (``d_table = g^T @ x``) — kept
outside the kernel so it rides the MXU at full tile efficiency and, under a
mesh, outside the custom VJP so shard_map's transpose inserts the dp
reduction (the composition rule proven by ops/vq_pallas).

Value/gradient parity with the unfused path (train/losses.kl_recon_loss over
nn.bert.BertMLMHead logits): logits tiles are rounded to bf16 right after
the f32 MXU accumulation, exactly where XLA's bf16 matmul rounds, so the
reductions see bit-identical inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _resolve_interpret(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


# --------------------------------------------------------------------- fwd


def _fwd_kernel(vocab, block_v, store, x_ref, et_ref, b_ref, tgt_ref,
                nll_ref, lse_ref, ids_ref, *rest):
    if store:
        logits_ref, m_s, s_s, t_s, av_s, ai_s = rest
    else:
        m_s, s_s, t_s, av_s, ai_s = rest
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    # logits tile on the MXU (f32 accumulation), rounded to bf16 where XLA's
    # bf16 matmul rounds, so value parity with the unfused path is exact.
    # et_ref is the PRE-TRANSPOSED (H, block_v) table tile: a plain NN
    # contraction — contracting both minors ((1,),(1,)) makes Mosaic
    # relayout the (block_v, H) operand on every grid step.
    acc = jax.lax.dot_general(
        x_ref[:], et_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    chunk_lp = acc.astype(x_ref.dtype) + b_ref[0, :].astype(x_ref.dtype)
    if store:
        logits_ref[:] = chunk_lp
    chunk = chunk_lp.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 1) + j * block_v
    chunk = jnp.where(col < vocab, chunk, NEG_INF)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)
        t_s[:] = jnp.zeros_like(t_s)
        av_s[:] = jnp.full_like(av_s, NEG_INF)
        ai_s[:] = jnp.zeros_like(ai_s)

    # online logsumexp
    m_old = m_s[:, 0]
    m_new = jnp.maximum(m_old, jnp.max(chunk, axis=1))
    corr = jnp.exp(m_old - m_new)
    s_s[:, 0] = s_s[:, 0] * corr + jnp.sum(jnp.exp(chunk - m_new[:, None]), axis=1)
    m_s[:, 0] = m_new

    # target logit (the gather, as a masked sum)
    tgt = tgt_ref[:, 0]
    hit = (col == tgt[:, None]) & (col < vocab)
    t_s[:, 0] = t_s[:, 0] + jnp.sum(jnp.where(hit, chunk, 0.0), axis=1)

    # running argmax; strict > keeps the FIRST maximum (jnp.argmax parity)
    tile_max = jnp.max(chunk, axis=1)
    tile_arg = jnp.argmax(chunk, axis=1).astype(jnp.int32) + j * block_v
    better = tile_max > av_s[:, 0]
    av_s[:, 0] = jnp.where(better, tile_max, av_s[:, 0])
    ai_s[:, 0] = jnp.where(better, tile_arg, ai_s[:, 0])

    @pl.when(j == n_j - 1)
    def _final():
        lse = m_s[:, 0] + jnp.log(s_s[:, 0])
        nll_ref[:, 0] = lse - t_s[:, 0]
        lse_ref[:, 0] = lse
        ids_ref[:, 0] = ai_s[:, 0]


def _head_ce_fwd_pallas(x2, table_t, bias, targets, store: bool,
                        block_r: int, block_v: int, interpret: bool):
    r_pad, h = x2.shape
    v = table_t.shape[1]
    grid = (r_pad // block_r, pl.cdiv(v, block_v))

    kernel = functools.partial(_fwd_kernel, v, block_v, store)
    out_shape = [
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),  # nll
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),  # lse
        jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),    # argmax ids
    ]
    out_specs = [
        pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    if store:
        out_shape.append(jax.ShapeDtypeStruct((r_pad, v), x2.dtype))
        out_specs.append(
            pl.BlockSpec((block_r, block_v), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, h), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x2, table_t, bias[None, :], targets[:, None].astype(jnp.int32))
    if store:
        nll, lse, ids, logits = outs
        return nll[:, 0], lse[:, 0], ids[:, 0], logits
    nll, lse, ids = outs
    return nll[:, 0], lse[:, 0], ids[:, 0], None


# --------------------------------------------------------------------- bwd


def _bwd_kernel(vocab, block_v, store, *refs):
    if store:
        (logits_ref, e_ref, tgt_ref, lse_ref, scale_ref,
         g_ref, dx_ref, dbias_ref, dx_acc) = refs
    else:
        # flash carries BOTH table orientations: (H, block_v) for the NN
        # logits recompute, (block_v, H) for the NN dx contraction
        (x_ref, et_ref, e_ref, b_ref, tgt_ref, lse_ref, scale_ref,
         g_ref, dx_ref, dbias_ref, dx_acc) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        dx_acc[:] = jnp.zeros_like(dx_acc)

    # dbias block is the WHOLE (1, v_pad) array with a constant index map, so
    # it stays resident in VMEM for the entire grid (Mosaic only flushes an
    # output block when its index changes) and can be accumulated across BOTH
    # grid axes — a (grid_r, v) per-row-tile partials layout would need a
    # (1, block_v) block, which violates the (8, 128) block-shape rule.
    @pl.when((i == 0) & (j == 0))
    def _init_bias():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    if store:
        chunk = logits_ref[:].astype(jnp.float32)
    else:
        acc = jax.lax.dot_general(
            x_ref[:], et_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # identical bf16 rounding point as the forward -> bitwise the same
        # logits tile, so exp(logit - lse) matches the stored-mode softmax
        chunk = (acc.astype(x_ref.dtype) + b_ref[0, :].astype(x_ref.dtype)).astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 1) + j * block_v
    p = jnp.exp(chunk - lse_ref[:, 0][:, None])
    onehot = (col == tgt_ref[:, 0][:, None]).astype(jnp.float32)
    gmat = (p - onehot) * scale_ref[:, 0][:, None]
    gmat = jnp.where(col < vocab, gmat, 0.0)
    g_bf = gmat.astype(g_ref.dtype)
    g_ref[:] = g_bf
    sl = pl.ds(j * block_v, block_v)
    dbias_ref[0:1, sl] = dbias_ref[0:1, sl] + jnp.sum(gmat, axis=0)[None, :]

    # dx += g @ E_tile, f32 accumulated in VMEM across vocab tiles. The dx
    # dot contracts over the vocab tile, so the ragged edge's out-of-bounds
    # table rows must be zeroed (0 * garbage-NaN would poison dx; the fwd
    # kernel is immune because its contraction is over H and bad columns are
    # select-masked). Static python gate: only the last tile is partial.
    e_t = e_ref[:]
    if vocab % block_v:
        row_ok = (jax.lax.broadcasted_iota(jnp.int32, e_t.shape, 0)
                  + j * block_v) < vocab
        e_t = jnp.where(row_ok, e_t, 0)
    dx_acc[:] = dx_acc[:] + jax.lax.dot_general(
        g_bf, e_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_j - 1)
    def _final():
        dx_ref[:] = dx_acc[:].astype(dx_ref.dtype)


def _head_ce_bwd_pallas(res_big, table, table_t, bias, targets, lse, scale,
                        store: bool, block_r: int, block_v: int, interpret: bool):
    """res_big = stored logits (store mode) or padded x2 (flash mode)."""
    r_pad = res_big.shape[0]
    v, h = table.shape
    grid = (r_pad // block_r, pl.cdiv(v, block_v))
    kernel = functools.partial(_bwd_kernel, v, block_v, store)

    row_spec = pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((block_v, h), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    et_spec = pl.BlockSpec((h, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    if store:
        in_specs = [
            pl.BlockSpec((block_r, block_v), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            e_spec, row_spec, row_spec, row_spec,
        ]
        args = (res_big, table, targets[:, None].astype(jnp.int32),
                lse[:, None], scale[:, None])
    else:
        in_specs = [
            pl.BlockSpec((block_r, h), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            et_spec, e_spec,
            pl.BlockSpec((1, block_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ]
        args = (res_big, table_t, table, bias[None, :],
                targets[:, None].astype(jnp.int32), lse[:, None], scale[:, None])

    v_pad = _round_up(v, block_v)
    g, dx, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_r, block_v), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, h), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            # whole-array grid-invariant accumulator (see _bwd_kernel)
            pl.BlockSpec((1, v_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, v), res_big.dtype if store else table.dtype),
            jax.ShapeDtypeStruct((r_pad, h), res_big.dtype if not store else table.dtype),
            jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_r, h), jnp.float32)],
        interpret=interpret,
    )(*args)
    return g, dx, dbias[0, :v]


# --------------------------------------------------------------------- api


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_head_ce_loss(hidden, table, bias, target_ids, valid_row, denom=None,
                       mode: str = "store", block_r: int = 512,
                       block_v: int = 1024, interpret: bool | None = None):
    """(B, S, H) transformed hidden states -> (scalar mean NLL, recon ids).

    ``table``: (V, H) tied word-embedding table (f32 param; cast to the
    compute dtype in-kernel). ``bias``: (V,) f32 head bias. Drop-in for
    ``kl_recon_loss(BertMLMHead(hidden), target_ids, valid_row)`` plus the
    subsequent ``argmax``; the MLM transform (dense+gelu+LN) stays in the
    model — this op fuses the vocab projection onward.

    ``denom``: optional externally supplied normalizer (a traced scalar).
    None -> the usual ``max(sum(valid_row), 1) * S``. The sharded wrapper
    passes the GLOBAL denom so per-shard losses are partial sums of the
    global mean.
    """
    (loss, ids), _ = _fused_fwd(hidden, table, bias, target_ids, valid_row,
                                denom, mode, block_r, block_v, interpret)
    return loss, ids


def _fused_fwd(hidden, table, bias, target_ids, valid_row, denom,
               mode, block_r, block_v, interpret):
    interpret = _resolve_interpret(interpret)
    store = mode == "store"
    b, s, h = hidden.shape
    r = b * s
    r_pad = _round_up(max(r, block_r), block_r)
    x2 = hidden.reshape(r, h)
    targets = target_ids.reshape(r)
    if r_pad != r:
        x2 = jnp.pad(x2, ((0, r_pad - r), (0, 0)))
        targets = jnp.pad(targets, (0, r_pad - r))
    # one cheap XLA transpose per call (45 MB bf16) buys NN-layout matmuls
    # on every one of the grid's ~1.4k steps
    table_t = table.astype(hidden.dtype).T
    nll, lse, ids, logits = _head_ce_fwd_pallas(
        x2, table_t, bias, targets, store, block_r, block_v, interpret
    )
    w = jnp.repeat(valid_row.astype(jnp.float32), s)
    if denom is None:
        denom = jnp.maximum(jnp.sum(valid_row.astype(jnp.float32)), 1.0) * s
    w_pad = jnp.pad(w, (0, r_pad - r)) if r_pad != r else w
    loss = jnp.sum(nll[:r] * w) / denom
    recon_ids = ids[:r].reshape(b, s)
    res_big = logits if store else x2
    return (loss, recon_ids), (res_big, x2, table, bias, targets, lse, w_pad,
                               denom, (b, s, h))


def _fused_bwd(mode, block_r, block_v, interpret, res, cts):
    g_loss, _ = cts  # recon_ids is integer output: no cotangent flows
    interpret = _resolve_interpret(interpret)
    store = mode == "store"
    res_big, x2, table, bias, targets, lse, w_pad, denom, (b, s, h) = res
    r = b * s
    scale = (g_loss / denom) * w_pad
    table_c = table.astype(x2.dtype)
    g, dx, dbias = _head_ce_bwd_pallas(
        res_big, table_c, table_c.T, bias, targets, lse, scale, store,
        block_r, block_v, interpret,
    )
    # table gradient as ONE plain XLA matmul over the materialized softmax
    # gradient: full-tile MXU efficiency, and outside the kernel so shard_map
    # transposes insert the dp psum when the op runs per-shard under a mesh
    d_table = jax.lax.dot_general(
        g, x2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(table.dtype)
    d_bias = dbias.astype(bias.dtype)
    d_hidden = dx[:r].reshape(b, s, h)
    return d_hidden, d_table, d_bias, None, None, None


fused_head_ce_loss.defvjp(_fused_fwd, _fused_bwd)


def fused_head_ce_loss_sharded(hidden, table, bias, target_ids, valid_row,
                               mesh, dp_axes, mode: str = "store",
                               block_r: int = 512, block_v: int = 1024,
                               interpret: bool | None = None):
    """Data-parallel fused head+CE: ONE shard_map over the mesh's dp axes
    runs the kernels on each device's local batch shard (a bare pallas
    custom call under GSPMD would force a batch all-gather). Composition
    rule as ops/vq_pallas.fused_vector_quantize_sharded / the fused trunk:
    per-shard partial losses are summed with ordinary differentiable ops
    OUTSIDE the custom VJP; table/bias enter replicated (in_spec P()) so the
    shard_map transpose reduces their per-shard cotangents."""
    from jax.sharding import PartitionSpec as P

    from kindergarten_vq_vae_tpu.parallel.mesh import shard_map_nocheck

    s = hidden.shape[1]
    dp = P(dp_axes)
    # GLOBAL normalizer, computed on the dp-sharded valid_row outside the map
    denom = jnp.maximum(jnp.sum(valid_row.astype(jnp.float32)), 1.0) * s

    def local(h_, tgt_, v_, tab_, b_, d_):
        part, ids = fused_head_ce_loss(
            h_, tab_, b_, tgt_, v_, d_, mode, block_r, block_v, interpret
        )
        return part[None], ids

    mapped = shard_map_nocheck(
        local, mesh=mesh, in_specs=(dp, dp, dp, P(), P(), P()),
        out_specs=(dp, dp),
    )
    parts, ids = mapped(hidden, target_ids, valid_row, table, bias, denom)
    return jnp.sum(parts), ids
