"""Fused whole-transformer-layer Pallas kernels (fwd + bwd) for tiny sequences.

The round-1/round-2 profiles showed the flagship step runs at ~30% MXU with
the time spread across small-op overhead and layout conversions BETWEEN the
ops of each BERT layer: at S=12 every intermediate (B, S, H) tensor is
sub-tile in its second-minor dimension, so XLA pays relayouts and low-
occupancy matmuls around the attention core, and the fused-SDPA kernel alone
(ops/sdpa_pallas.py) only recovered ~4% because the surrounding projections
still round-trip HBM per op.

This module fuses ONE ENTIRE POST-LN BERT LAYER per kernel invocation:

    LN(x + drop(Wo @ attn(Wqkv @ x)))          # self-attention block
    [LN(x + drop(Wco @ attn(Wq @ x, Wkv @ enc)))]  # cross-attn (decoder)
    LN(x + drop(W2 @ gelu(W1 @ x)))            # MLP block

over a grid of sentence tiles: each grid step loads a (TB, S, H) activation
tile once from HBM, keeps EVERYTHING (qkv, attention scores, gelu inputs,
residuals, LN statistics) VMEM-resident, and writes only the layer output
back. All weights use constant index maps, so Mosaic keeps them resident in
VMEM across the whole grid (one HBM fetch per layer per step).

The BACKWARD is a second kernel with the same tiling that RECOMPUTES the
forward per tile (activations never hit HBM in either direction — this is
rematerialization at VMEM granularity, much stronger than jax.checkpoint)
and accumulates every weight/bias/LN gradient across grid steps into
f32 VMEM accumulators (constant-index-map outputs, @pl.when(first) init —
the TPU grid is sequential so read-modify-write accumulation is sound; the
same pattern as the fused-VQ kernel's grid-carried stats). Per-tile
activation gradients (dx, denc) stream out block by block.

Dropout (attention-prob + the three hidden-dropout sites) uses the same
counter-based murmur-fmix hash as ops/sdpa_pallas.py — pure VPU integer ops,
bit-identical between forward and backward (no PRNG state), with a distinct
op-id per dropout site folded into the hash.

Semantics anchor: the reference's per-layer module stack is HF
BertLayer (attention/crossattention/intermediate/output), consumed via
models/bagon/Bagon.py:25-55; the jnp oracle this kernel is parity-tested
against (value AND every gradient) is nn/bert.py's BertLayer.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kindergarten_vq_vae_tpu.ops.sdpa_pallas import (
    NEG_INF,
    _dropout_keep_scale,
    _resolve_interpret,
    _tile_geometry,
)

SQRT_2 = float(np.sqrt(2.0))
INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))
TANH_C = float(np.sqrt(2.0 / np.pi))

# weight-tuple layouts (wrapper and kernels must agree)
ENC_WEIGHTS = ("wqkv", "bqkv", "wo", "bo", "g1", "be1",
               "w1", "b1", "w2", "b2", "g3", "be3")
DEC_WEIGHTS = ("wqkv", "bqkv", "wo", "bo", "g1", "be1",
               "wq", "bq", "wkv", "bkv", "wco", "bco", "g2", "be2",
               "w1", "b1", "w2", "b2", "g3", "be3")


@dataclasses.dataclass(frozen=True)
class LayerGeom:
    """Static geometry/config of one fused layer call."""

    num_heads: int
    head_dim: int
    s_q: int                    # sentence length of x
    s_k: int                    # sentence length of enc (cross-attn keys)
    intermediate: int
    causal: bool                # causal self-attention (decoder mode)
    has_cross: bool
    attn_rate: float
    hid_rate: float
    eps: float
    gelu_exact: bool
    block_b_fwd: int = 64       # sentences per forward tile
    block_b_bwd: int = 32       # sentences per backward tile (dW accums live in VMEM)
    # sentences per attention sub-chunk: the packed score matmul costs
    # O((nc*S)^2) for O(nc*S^2) useful block-diagonal entries, so smaller
    # chunks cut pure waste — but nc*S should stay a multiple of the 128-wide
    # MXU tile (32*12=384) or the padding eats the gain. Projections keep the
    # full tile's rows.
    attn_chunk: int = 8
    # Forward-specific attention chunk; 0 = use attn_chunk. Safe to differ
    # from the backward's: the dropout hash keys on absolute row ids
    # (ops/sdpa_pallas._dropout_keep_scale), so keep masks are bit-identical
    # under any tile/chunk decomposition.
    attn_chunk_fwd: int = 0
    # True: the fwd (training) kernel streams the matmul outputs (qkv, ctx,
    # x1/x2, u, LN stats) to HBM and the bwd kernel reads them back instead
    # of recomputing the forward per tile. MEASURED SLOWER at bert-base
    # (321 vs 240 ms/step): the ~10 GB/step residual round-trip and the extra
    # per-tile output streams cost more than the ~4 TF of recompute they
    # save — on TPU, FLOPs are cheaper than bytes. Default False = full
    # per-tile recompute, nothing but x/gy/weights touches HBM in backward.
    save_residuals: bool = False
    # With save_residuals, run the backward as plain XLA ops + standalone
    # attention kernels instead of the monolithic bwd kernel. MEASURED SLOWER
    # at bert-base (333 vs 240 ms/step): every intermediate round-trips HBM,
    # recreating the memory-bound behavior the fused kernel exists to avoid.
    # Kept as a fallback for geometries that exceed the bwd kernel's VMEM.
    xla_bwd: bool = False

    @property
    def hidden(self) -> int:
        return self.num_heads * self.head_dim


def _mm(a, w):
    """(rows, K) @ (K, N) -> f32 (rows, N); inputs stay in compute dtype."""
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_tn(a, b):
    """a^T @ b over rows: (rows, K)^T @ (rows, N) -> f32 (K, N)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_nt(a, w):
    """a @ w^T: (rows, N) @ (K, N)^T -> f32 (rows, K)."""
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _keep_2d(seed, tile, op, rows, cols, rate):
    """(rows, cols) f32 hidden-dropout keep/scale mask: murmur-fmix of
    (global row, column, op-site, seed). Same structure as the attention
    keep mask in ops/sdpa_pallas.py, distinct op ids keep streams disjoint."""
    gr = (
        jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
        + jnp.uint32(rows) * tile.astype(jnp.uint32)
    )
    row_term = gr * jnp.uint32(0x9E3779B1) + (
        seed.astype(jnp.uint32) + jnp.uint32(op) * jnp.uint32(0xC2B2AE3D)
    )
    col = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1)
    x = row_term ^ (col * jnp.uint32(0x85EBCA77))
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    thresh = np.uint32(min(rate, 1.0) * float(2**32 - 1))
    return jnp.where(x >= thresh, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _ln_fwd(r, gamma, beta, eps, out_dtype):
    """Post-LN with fast variance (flax default). r is f32 (rows, N).
    Returns (out, yhat, inv) — yhat/inv are the backward residuals."""
    mu = jnp.mean(r, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(r * r, axis=1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    yhat = (r - mu) * inv
    out = (yhat * gamma + beta).astype(out_dtype)
    return out, yhat, inv


def _ln_bwd(gy, yhat, inv, gamma):
    """d/dr of LN given upstream gy (f32)."""
    dyhat = gy * gamma
    m1 = jnp.mean(dyhat, axis=1, keepdims=True)
    m2 = jnp.mean(dyhat * yhat, axis=1, keepdims=True)
    return inv * (dyhat - m1 - yhat * m2)


# erf(x) ~ tanh(p(x)) with p an odd degree-13 polynomial, fitted with the
# tanh-sensitivity weight (1 - erf^2) and Lawson-iterated toward minimax;
# max abs error 5.8e-8 in exact arithmetic (tighter than A&S 7.1.26's
# 1.5e-7), ~1.5e-7 when the Horner chain is evaluated in f32 (rounding-
# dominated). No division or exp — one hardware tanh + 6 FMAs on the VPU.
# p grows past atanh's pole for |x| > ~4, where tanh saturates to +-1 = erf.
_ERF_P = (1.1283797055e+00, 1.0276548145e-01, -1.8438367938e-04,
          -6.2571958331e-04, 8.9712590414e-05, -5.9856910908e-06,
          1.5896024415e-07)


def _erf_p(z2):
    """p(z)/z as a polynomial in z^2 (Horner)."""
    acc = _ERF_P[-1]
    for c in _ERF_P[-2::-1]:
        acc = acc * z2 + c
    return acc


def _erf_dp(z2):
    """p'(z) as a polynomial in z^2 (Horner over (2k+1)*c_k)."""
    acc = 13.0 * _ERF_P[-1]
    for d, c in zip((11, 9, 7, 5, 3, 1), _ERF_P[-2::-1]):
        acc = acc * z2 + d * c
    return acc


def _erf(x):
    return jnp.tanh(x * _erf_p(x * x))


def _gelu_fwd(u, exact):
    if exact:
        return 0.5 * u * (1.0 + _erf(u / SQRT_2))
    w = TANH_C * (u + 0.044715 * u * u * u)
    return 0.5 * u * (1.0 + jnp.tanh(w))


def _gelu_grad(u, exact):
    if exact:
        # exact derivative OF THE tanh-erf approximation (chain rule through
        # the same tanh the forward uses — gradient-consistent, max abs err
        # vs the true gelu' is 1.7e-6, and phi comes free: no exp needed)
        z = u * (1.0 / SQRT_2)
        z2 = z * z
        t = jnp.tanh(z * _erf_p(z2))
        return 0.5 * (1.0 + t) + (0.5 / SQRT_2) * u * (1.0 - t * t) * _erf_dp(z2)
    w = TANH_C * (u + 0.044715 * u * u * u)
    t = jnp.tanh(w)
    return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * TANH_C * (
        1.0 + 3.0 * 0.044715 * u * u
    )


def _attn_chunks(nc, tb):
    """Effective (sentences-per-chunk, n_chunks) for a tile of tb sentences."""
    if nc <= 0 or nc >= tb or tb % nc != 0:
        return tb, 1
    return nc, tb // nc


def _attn_fwd_tile(q2, k2, v2, kv_mask, causal, seed, tile, op_base,
                   nh, hd, tb, s_q, s_k, rate, cdtype, nc, keep_p=False):
    """Block-diagonal attention over packed rows (same math as
    ops/sdpa_pallas._sdpa_fwd_kernel), chunked into nc-sentence diagonal
    blocks so the packed score matmuls waste O(nc) instead of O(tb).
    The chunked dropout hash is bit-identical to the unchunked one (the
    chunk-local tile index reproduces the same global row ids).

    The bias is built CHUNK-LOCALLY from the (1, tb*s_k) key mask: the old
    full-tile _tile_bias materialized (tb*s_q, tb*s_k) qpos/kpos/bias arrays
    (28 MB of VPU work + VMEM at tb=128, S=12) of which only the diagonal
    (rq, rk) chunk blocks were ever read. The chunk-local qpos/kpos formulas
    are position-invariant across chunks (kpos[c*rq+r, c*rk+k] =
    k - (r//s_q)*s_k for every c), so one (rq, rk) geometry + a per-chunk
    key-mask AND reproduce the sliced values bit-exactly — including the
    dropout stream, which hashes kpos VALUES and the global chunk index.

    Returns f32 (rows_q, H) context; with keep_p also the pre-dropout
    probability tiles (indexed [chunk][head]) for reuse in the backward."""
    scale = 1.0 / float(np.sqrt(hd))
    nc, n_chunks = _attn_chunks(nc, tb)
    rq, rk = nc * s_q, nc * s_k
    qpos_c, kpos_c = _tile_geometry(nc, s_q, s_k)
    ok_geo = (kpos_c >= 0) & (kpos_c < s_k)
    if causal:
        ok_geo = ok_geo & (qpos_c >= kpos_c)
    chunk_rows, pcache = [], []
    for c in range(n_chunks):
        kv = kv_mask[:, c * rk:(c + 1) * rk]  # (1, rk)
        ok = ok_geo & jnp.broadcast_to(kv > 0, (rq, rk))
        cbias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
        ckpos = kpos_c if rate > 0.0 else None
        ctile = tile * n_chunks + c
        parts, pch = [], []
        for h in range(nh):
            sl = slice(h * hd, (h + 1) * hd)
            qh = q2[c * rq:(c + 1) * rq, sl]
            kh = k2[c * rk:(c + 1) * rk, sl]
            vh = v2[c * rk:(c + 1) * rk, sl]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale + cbias
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            z = jnp.sum(e, axis=1, keepdims=True)
            p = e / z
            if keep_p:
                pch.append(p)
            if rate > 0.0:
                p = p * _dropout_keep_scale(seed, ctile, op_base + h, ckpos, nc, s_q, s_k, rate)
            parts.append(jax.lax.dot_general(
                p.astype(cdtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        chunk_rows.append(jnp.concatenate(parts, axis=1))
        pcache.append(pch)
    ctx = chunk_rows[0] if n_chunks == 1 else jnp.concatenate(chunk_rows, axis=0)
    return (ctx, pcache) if keep_p else ctx


def _attn_bwd_tile(q2, k2, v2, kv_mask, causal, seed, tile, op_base, g_ctx,
                   nh, hd, tb, s_q, s_k, rate, cdtype, nc, p_cache=None):
    """Backward of _attn_fwd_tile (same chunk-local bias construction).
    g_ctx f32. Reuses p_cache from a keep_p forward when given (saves the
    scores matmul + softmax per chunk/head), else recomputes p. Returns
    f32 (dq, dk, dv), (rows, H)."""
    scale = 1.0 / float(np.sqrt(hd))
    nc, n_chunks = _attn_chunks(nc, tb)
    rq, rk = nc * s_q, nc * s_k
    qpos_c, kpos_c = _tile_geometry(nc, s_q, s_k)
    ok_geo = (kpos_c >= 0) & (kpos_c < s_k)
    if causal:
        ok_geo = ok_geo & (qpos_c >= kpos_c)
    dq_rows, dk_rows, dv_rows = [], [], []
    for c in range(n_chunks):
        kv = kv_mask[:, c * rk:(c + 1) * rk]
        ok = ok_geo & jnp.broadcast_to(kv > 0, (rq, rk))
        cbias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
        ckpos = kpos_c if rate > 0.0 else None
        ctile = tile * n_chunks + c
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(nh):
            sl = slice(h * hd, (h + 1) * hd)
            qh = q2[c * rq:(c + 1) * rq, sl]
            kh = k2[c * rk:(c + 1) * rk, sl]
            vh = v2[c * rk:(c + 1) * rk, sl]
            gh = g_ctx[c * rq:(c + 1) * rq, sl].astype(cdtype)
            if p_cache is not None:
                p = p_cache[c][h]
            else:
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * scale + cbias
                m = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - m)
                z = jnp.sum(e, axis=1, keepdims=True)
                p = e / z
            if rate > 0.0:
                kappa = _dropout_keep_scale(seed, ctile, op_base + h, ckpos, nc, s_q, s_k, rate)
                pd = p * kappa
            else:
                pd = p
            dv_parts.append(jax.lax.dot_general(
                pd.astype(cdtype), gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            dpd = jax.lax.dot_general(
                gh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            dp = dpd * kappa if rate > 0.0 else dpd
            t = jnp.sum(dp * p, axis=1, keepdims=True)
            ds = (p * (dp - t) * scale).astype(cdtype)
            dq_parts.append(jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ))
            dk_parts.append(jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ))
        dq_rows.append(jnp.concatenate(dq_parts, axis=1))
        dk_rows.append(jnp.concatenate(dk_parts, axis=1))
        dv_rows.append(jnp.concatenate(dv_parts, axis=1))
    if n_chunks == 1:
        return dq_rows[0], dk_rows[0], dv_rows[0]
    return (
        jnp.concatenate(dq_rows, axis=0),
        jnp.concatenate(dk_rows, axis=0),
        jnp.concatenate(dv_rows, axis=0),
    )


def _layer_fwd_core(geom: LayerGeom, tb, seed, tile, x, enc, smask_kv,
                    cmask_kv, W, keep_p=False, skip_final=False):
    """Shared forward math (used by fwd kernel, and recomputed in bwd).

    x: (rows, H) cdtype; enc: (rows_k, H) cdtype or None; smask_kv/cmask_kv:
    (1, tb*s) key masks (attention bias is built chunk-locally inside the
    attention tiles). Returns the final output plus every residual the
    backward needs (all VMEM values). skip_final stops before the last
    projection + LayerNorm (the lite backward recovers them from the stored
    layer output instead — saves the w2 matmul in every recompute)."""
    g = geom
    nh, hd, H = g.num_heads, g.head_dim, g.hidden
    cdtype = x.dtype
    rows = tb * g.s_q
    res = {}

    # ---- self-attention block
    qkv = _mm(x, W["wqkv"]) + W["bqkv"]
    qkv_c = qkv.astype(cdtype)
    res["qkv_c"] = qkv_c
    q2, k2, v2 = qkv_c[:, :H], qkv_c[:, H:2 * H], qkv_c[:, 2 * H:]
    ctx = _attn_fwd_tile(q2, k2, v2, smask_kv, g.causal, seed, tile, 0,
                         nh, hd, tb, g.s_q, g.s_q, g.attn_rate, cdtype,
                         g.attn_chunk, keep_p)
    if keep_p:
        ctx, res["p_self"] = ctx
    ctx_c = ctx.astype(cdtype)
    res["ctx_c"] = ctx_c
    a1 = _mm(ctx_c, W["wo"]) + W["bo"]
    if g.hid_rate > 0.0:
        k1 = _keep_2d(seed, tile, 1000, rows, H, g.hid_rate)
        res["k1"] = k1
        a1 = a1 * k1
    r1 = x.astype(jnp.float32) + a1
    x1, yhat1, inv1 = _ln_fwd(r1, W["g1"], W["be1"], g.eps, cdtype)
    res["x1"], res["yhat1"], res["inv1"] = x1, yhat1, inv1

    xm = x1  # input to the MLP block (replaced by x2 in decoder mode)

    # ---- cross-attention block (decoder)
    if g.has_cross:
        qc = (_mm(x1, W["wq"]) + W["bq"]).astype(cdtype)
        kvc = (_mm(enc, W["wkv"]) + W["bkv"]).astype(cdtype)
        res["qc"], res["kvc"] = qc, kvc
        kc, vc = kvc[:, :H], kvc[:, H:]
        ctx2 = _attn_fwd_tile(qc, kc, vc, cmask_kv, False, seed, tile, nh + 1,
                              nh, hd, tb, g.s_q, g.s_k, g.attn_rate, cdtype,
                              g.attn_chunk, keep_p)
        if keep_p:
            ctx2, res["p_cross"] = ctx2
        ctx2_c = ctx2.astype(cdtype)
        res["ctx2_c"] = ctx2_c
        a2 = _mm(ctx2_c, W["wco"]) + W["bco"]
        if g.hid_rate > 0.0:
            k2d = _keep_2d(seed, tile, 1001, rows, H, g.hid_rate)
            res["k2"] = k2d
            a2 = a2 * k2d
        r2 = x1.astype(jnp.float32) + a2
        x2, yhat2, inv2 = _ln_fwd(r2, W["g2"], W["be2"], g.eps, cdtype)
        res["x2"], res["yhat2"], res["inv2"] = x2, yhat2, inv2
        xm = x2

    # ---- MLP block
    u = _mm(xm, W["w1"]) + W["b1"]
    u_c = u.astype(cdtype)
    res["u_c"] = u_c
    mlp = _gelu_fwd(u, g.gelu_exact).astype(cdtype)
    res["m_c"] = mlp
    if skip_final:
        if g.hid_rate > 0.0:
            res["k3"] = _keep_2d(seed, tile, 1002, rows, H, g.hid_rate)
        return None, res
    y = _mm(mlp, W["w2"]) + W["b2"]
    if g.hid_rate > 0.0:
        k3 = _keep_2d(seed, tile, 1002, rows, H, g.hid_rate)
        res["k3"] = k3
        y = y * k3
    r3 = xm.astype(jnp.float32) + y
    out, yhat3, inv3 = _ln_fwd(r3, W["g3"], W["be3"], g.eps, cdtype)
    res["yhat3"], res["inv3"] = yhat3, inv3
    return out, res


def _weights_dict(geom, refs):
    names = DEC_WEIGHTS if geom.has_cross else ENC_WEIGHTS
    return {n: r[:] for n, r in zip(names, refs)}


def _res_layout(geom: LayerGeom, mode: str = "full"):
    """(name, sentence-len, width, kind) of each saved residual, in the
    fwd-output / bwd-input contract order. kind 'c' = compute dtype,
    'f32' = float32. 'invs' packs the up-to-3 per-row LN rsqrt stats into
    lanes 0/1/2 of a 128-lane f32 row (a (rows, 1) output would round up to
    a full lane tile anyway). mode 'lite' saves ONLY invs: the recompute
    backward then derives the final LN from the stored layer output + inv3
    instead of re-running the w2 matmul."""
    H, F = geom.hidden, geom.intermediate
    if mode == "lite":
        return [("invs", geom.s_q, 128, "f32")]
    out = [
        ("qkv_c", geom.s_q, 3 * H, "c"),
        ("ctx_c", geom.s_q, H, "c"),
        ("x1", geom.s_q, H, "c"),
    ]
    if geom.has_cross:
        out += [
            ("qc", geom.s_q, H, "c"),
            ("kvc", geom.s_k, 2 * H, "c"),
            ("ctx2_c", geom.s_q, H, "c"),
            ("x2", geom.s_q, H, "c"),
        ]
    out += [("u_c", geom.s_q, F, "c"), ("invs", geom.s_q, 128, "f32")]
    return out


def _layer_fwd_kernel(geom: LayerGeom, save: str, seed_ref, *refs):
    g = geom
    tb = g.block_b_fwd
    rows = tb * g.s_q
    pos = 0
    x_ref = refs[pos]; pos += 1
    enc_ref = None
    if g.has_cross:
        enc_ref = refs[pos]; pos += 1
    smask_ref = refs[pos]; pos += 1
    cmask_ref = None
    if g.has_cross:
        cmask_ref = refs[pos]; pos += 1
    n_w = len(DEC_WEIGHTS if g.has_cross else ENC_WEIGHTS)
    w_refs = refs[pos:pos + n_w]; pos += n_w
    out_ref = refs[pos]; pos += 1
    res_refs = refs[pos:] if save != "none" else ()

    W = _weights_dict(g, w_refs)
    x = x_ref[:].reshape(rows, g.hidden)
    enc = enc_ref[:].reshape(tb * g.s_k, g.hidden) if g.has_cross else None

    smask_kv = smask_ref[0]  # (1, tb*s_q)
    cmask_kv = cmask_ref[0] if g.has_cross else None

    out, res = _layer_fwd_core(
        g, tb, seed_ref[0], pl.program_id(0), x, enc, smask_kv, cmask_kv, W
    )
    out_ref[:] = out.reshape(tb, g.s_q, g.hidden).astype(out_ref.dtype)
    if save != "none":
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        invs = jnp.where(lane == 0, res["inv1"], 0.0)
        if g.has_cross:
            invs = invs + jnp.where(lane == 1, res["inv2"], 0.0)
        invs = invs + jnp.where(lane == 2, res["inv3"], 0.0)
        res["invs"] = invs
        for (name, s_dim, width, _), ref in zip(_res_layout(g, save), res_refs):
            ref[:] = res[name].reshape(tb, s_dim, width).astype(ref.dtype)


def _acc(ref, val):
    """Accumulate into a constant-index-map output across the sequential grid."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        ref[:] = val.astype(ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        ref[:] = ref[:] + val.astype(ref.dtype)


def _ln_recover_yhat(v, gamma, beta):
    """Invert the stored post-LN output back to its normalized value.
    v was (yhat*gamma + beta) cast to compute dtype, so in bf16 the recovery
    carries one cast of rounding noise — negligible against LN-grad scale.
    gamma==0 lanes are unrecoverable (and contribute dyhat=0 anyway): map
    them to 0 instead of inf."""
    g32 = gamma.astype(jnp.float32)
    return jnp.where(g32 == 0.0, 0.0, (v.astype(jnp.float32) - beta) / g32)


def _layer_bwd_kernel(geom: LayerGeom, save: str, seed_ref, *refs):
    g = geom
    tb = g.block_b_bwd
    rows = tb * g.s_q
    nh, hd, H = g.num_heads, g.head_dim, g.hidden
    names = DEC_WEIGHTS if g.has_cross else ENC_WEIGHTS

    pos = 0
    x_ref = refs[pos]; pos += 1
    enc_ref = None
    if g.has_cross:
        enc_ref = refs[pos]; pos += 1
    smask_ref = refs[pos]; pos += 1
    cmask_ref = None
    if g.has_cross:
        cmask_ref = refs[pos]; pos += 1
    gy_ref = refs[pos]; pos += 1
    out_ref = None
    res_refs = ()
    if save != "none":
        out_ref = refs[pos]; pos += 1
        n_res = len(_res_layout(g, save))
        res_refs = refs[pos:pos + n_res]; pos += n_res
    w_refs = refs[pos:pos + len(names)]; pos += len(names)
    dx_ref = refs[pos]; pos += 1
    denc_ref = None
    if g.has_cross:
        denc_ref = refs[pos]; pos += 1
    dw_refs = {n: refs[pos + i] for i, n in enumerate(names)}

    W = _weights_dict(g, w_refs)
    cdtype = x_ref.dtype
    x = x_ref[:].reshape(rows, H)
    enc = enc_ref[:].reshape(tb * g.s_k, H) if g.has_cross else None
    seed, tile = seed_ref[0], pl.program_id(0)

    smask_kv = smask_ref[0]  # (1, tb*s_q)
    cmask_kv = cmask_ref[0] if g.has_cross else None

    if save == "full":
        # rebuild the residual dict from the streamed fwd outputs — no
        # recompute matmuls; only VPU-cheap values (gelu, dropout masks,
        # yhat recovery) are rematerialized
        res = {}
        for (name, s_dim, width, _), ref in zip(_res_layout(g, save), res_refs):
            res[name] = ref[:].reshape(tb * s_dim, width)
        invs = res.pop("invs")
        res["inv1"], res["inv3"] = invs[:, 0:1], invs[:, 2:3]
        res["yhat1"] = _ln_recover_yhat(res["x1"], W["g1"], W["be1"])
        if g.has_cross:
            res["inv2"] = invs[:, 1:2]
            res["yhat2"] = _ln_recover_yhat(res["x2"], W["g2"], W["be2"])
        res["yhat3"] = _ln_recover_yhat(
            out_ref[:].reshape(rows, H), W["g3"], W["be3"]
        )
        res["m_c"] = _gelu_fwd(res["u_c"].astype(jnp.float32), g.gelu_exact).astype(cdtype)
        if g.hid_rate > 0.0:
            res["k1"] = _keep_2d(seed, tile, 1000, rows, H, g.hid_rate)
            if g.has_cross:
                res["k2"] = _keep_2d(seed, tile, 1001, rows, H, g.hid_rate)
            res["k3"] = _keep_2d(seed, tile, 1002, rows, H, g.hid_rate)
    else:
        # lite: recompute the forward, keeping residuals (incl. the
        # attention probability tiles, reused below) in VMEM — but STOP
        # before the final w2 projection + LayerNorm and recover that LN
        # from the stored layer output + streamed inv3 (saves a 58 GF
        # matmul per layer per backward at bert-base)
        _, res = _layer_fwd_core(g, tb, seed, tile, x, enc, smask_kv,
                                 cmask_kv, W, keep_p=True, skip_final=True)
        res["yhat3"] = _ln_recover_yhat(
            out_ref[:].reshape(rows, H), W["g3"], W["be3"]
        )
        res["inv3"] = res_refs[0][:].reshape(rows, 128)[:, 2:3]

    gy = gy_ref[:].reshape(rows, H).astype(jnp.float32)

    # ---- MLP block backward
    _acc(dw_refs["g3"], jnp.sum(gy * res["yhat3"], axis=0, keepdims=True))
    _acc(dw_refs["be3"], jnp.sum(gy, axis=0, keepdims=True))
    dr3 = _ln_bwd(gy, res["yhat3"], res["inv3"], W["g3"])
    dy = dr3 * res["k3"] if g.hid_rate > 0.0 else dr3
    dy_c = dy.astype(cdtype)
    _acc(dw_refs["w2"], _mm_tn(res["m_c"], dy_c))
    _acc(dw_refs["b2"], jnp.sum(dy, axis=0, keepdims=True))
    dm = _mm_nt(dy_c, W["w2"])
    du = dm * _gelu_grad(res["u_c"].astype(jnp.float32), g.gelu_exact)
    du_c = du.astype(cdtype)
    xm = res["x2"] if g.has_cross else res["x1"]
    _acc(dw_refs["w1"], _mm_tn(xm, du_c))
    _acc(dw_refs["b1"], jnp.sum(du, axis=0, keepdims=True))
    dxm = dr3 + _mm_nt(du_c, W["w1"])

    # ---- cross-attention block backward (decoder)
    if g.has_cross:
        _acc(dw_refs["g2"], jnp.sum(dxm * res["yhat2"], axis=0, keepdims=True))
        _acc(dw_refs["be2"], jnp.sum(dxm, axis=0, keepdims=True))
        dr2 = _ln_bwd(dxm, res["yhat2"], res["inv2"], W["g2"])
        da2 = dr2 * res["k2"] if g.hid_rate > 0.0 else dr2
        da2_c = da2.astype(cdtype)
        _acc(dw_refs["wco"], _mm_tn(res["ctx2_c"], da2_c))
        _acc(dw_refs["bco"], jnp.sum(da2, axis=0, keepdims=True))
        dctx2 = _mm_nt(da2_c, W["wco"])
        kvc = res["kvc"]
        dqc, dkc, dvc = _attn_bwd_tile(
            res["qc"], kvc[:, :H], kvc[:, H:], cmask_kv, False, seed, tile,
            nh + 1, dctx2, nh, hd, tb, g.s_q, g.s_k, g.attn_rate, cdtype,
            g.attn_chunk, res.get("p_cross"),
        )
        dqc_c = dqc.astype(cdtype)
        _acc(dw_refs["wq"], _mm_tn(res["x1"], dqc_c))
        _acc(dw_refs["bq"], jnp.sum(dqc, axis=0, keepdims=True))
        dkv = jnp.concatenate([dkc, dvc], axis=1)
        dkv_c = dkv.astype(cdtype)
        _acc(dw_refs["wkv"], _mm_tn(enc, dkv_c))
        _acc(dw_refs["bkv"], jnp.sum(dkv, axis=0, keepdims=True))
        denc = _mm_nt(dkv_c, W["wkv"])
        denc_ref[:] = denc.reshape(tb, g.s_k, H).astype(denc_ref.dtype)
        dx1 = dr2 + _mm_nt(dqc_c, W["wq"])
    else:
        dx1 = dxm

    # ---- self-attention block backward
    _acc(dw_refs["g1"], jnp.sum(dx1 * res["yhat1"], axis=0, keepdims=True))
    _acc(dw_refs["be1"], jnp.sum(dx1, axis=0, keepdims=True))
    dr1 = _ln_bwd(dx1, res["yhat1"], res["inv1"], W["g1"])
    da1 = dr1 * res["k1"] if g.hid_rate > 0.0 else dr1
    da1_c = da1.astype(cdtype)
    _acc(dw_refs["wo"], _mm_tn(res["ctx_c"], da1_c))
    _acc(dw_refs["bo"], jnp.sum(da1, axis=0, keepdims=True))
    dctx = _mm_nt(da1_c, W["wo"])
    qkv_c = res["qkv_c"]
    dq, dk, dv = _attn_bwd_tile(
        qkv_c[:, :H], qkv_c[:, H:2 * H], qkv_c[:, 2 * H:], smask_kv, g.causal,
        seed, tile, 0, dctx, nh, hd, tb, g.s_q, g.s_q, g.attn_rate, cdtype,
        g.attn_chunk, res.get("p_self"),
    )
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)
    dqkv_c = dqkv.astype(cdtype)
    _acc(dw_refs["wqkv"], _mm_tn(x, dqkv_c))
    _acc(dw_refs["bqkv"], jnp.sum(dqkv, axis=0, keepdims=True))
    dx = dr1 + _mm_nt(dqkv_c, W["wqkv"])
    dx_ref[:] = dx.reshape(tb, g.s_q, H).astype(dx_ref.dtype)


def _attn_bwd_self_kernel(geom: LayerGeom, tb, seed_ref, qkv_ref, mask_ref,
                          g_ref, dqkv_ref):
    g = geom
    rows = tb * g.s_q
    H = g.hidden
    qkv = qkv_ref[:].reshape(rows, 3 * H)
    gc = g_ref[:].reshape(rows, H).astype(jnp.float32)
    dq, dk, dv = _attn_bwd_tile(
        qkv[:, :H], qkv[:, H:2 * H], qkv[:, 2 * H:], mask_ref[0], g.causal,
        seed_ref[0], pl.program_id(0), 0, gc, g.num_heads, g.head_dim,
        tb, g.s_q, g.s_q, g.attn_rate, qkv.dtype, g.attn_chunk,
    )
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)
    dqkv_ref[:] = dqkv.reshape(tb, g.s_q, 3 * H).astype(dqkv_ref.dtype)


def _attn_bwd_cross_kernel(geom: LayerGeom, tb, seed_ref, q_ref, kv_ref,
                           mask_ref, g_ref, dq_ref, dkv_ref):
    g = geom
    rows = tb * g.s_q
    H = g.hidden
    q = q_ref[:].reshape(rows, H)
    kv = kv_ref[:].reshape(tb * g.s_k, 2 * H)
    gc = g_ref[:].reshape(rows, H).astype(jnp.float32)
    dq, dk, dv = _attn_bwd_tile(
        q, kv[:, :H], kv[:, H:], mask_ref[0], False,
        seed_ref[0], pl.program_id(0), g.num_heads + 1, gc, g.num_heads,
        g.head_dim, tb, g.s_q, g.s_k, g.attn_rate, q.dtype, g.attn_chunk,
    )
    dq_ref[:] = dq.reshape(tb, g.s_q, H).astype(dq_ref.dtype)
    dkv = jnp.concatenate([dk, dv], axis=1)
    dkv_ref[:] = dkv.reshape(tb, g.s_k, 2 * H).astype(dkv_ref.dtype)


def _attn_bwd_call(geom, cross: bool, qkv_or_q, kv, mask, seed, g_ctx, interpret):
    """Standalone block-diagonal attention backward over sentence tiles.
    Recomputes the probs from the saved projections; no weights in VMEM, so
    the fwd tile size is fine. The in-kernel dropout hash uses absolute row
    ids, so any tile/chunk split reproduces the fwd kernel's stream."""
    interpret = _resolve_interpret(interpret)
    b = qkv_or_q.shape[0]
    tb = min(geom.block_b_fwd, b)
    b_pad = ((b + tb - 1) // tb) * tb
    grid = b_pad // tb
    s_q, s_k, H = geom.s_q, geom.s_k if cross else geom.s_q, geom.hidden
    cdtype = qkv_or_q.dtype

    m = _pad_mask(mask, b_pad).astype(jnp.int32).reshape(grid, 1, tb * s_k)
    mspec = pl.BlockSpec((1, 1, tb * s_k), lambda i, seed: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((tb, s_q, H), lambda i, seed: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    gp = _pad_rows(g_ctx.astype(cdtype), b_pad)
    kwargs = dict(
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )
    if cross:
        qspec = gspec
        kvspec = pl.BlockSpec((tb, s_k, 2 * H), lambda i, seed: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        dq, dkv = pl.pallas_call(
            functools.partial(_attn_bwd_cross_kernel, geom, tb),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[qspec, kvspec, mspec, gspec],
                out_specs=[qspec, kvspec],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b_pad, s_q, H), cdtype),
                jax.ShapeDtypeStruct((b_pad, s_k, 2 * H), cdtype),
            ],
            **kwargs,
        )(seed, _pad_rows(qkv_or_q, b_pad), _pad_rows(kv, b_pad), m, gp)
        return dq[:b], dkv[:b]
    qkvspec = pl.BlockSpec((tb, s_q, 3 * H), lambda i, seed: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        functools.partial(_attn_bwd_self_kernel, geom, tb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[qkvspec, mspec, gspec],
            out_specs=qkvspec,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_q, 3 * H), cdtype),
        **kwargs,
    )(seed, _pad_rows(qkv_or_q, b_pad), m, gp)
    return dqkv[:b]


# ---------------------------------------------------------------------------
# host-side wrappers


def _pad_rows(a, b_pad):
    if a.shape[0] == b_pad:
        return a
    return jnp.pad(a, ((0, b_pad - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


def _pad_mask(m, b_pad):
    if m.shape[0] == b_pad:
        return m
    return jnp.pad(m, ((0, b_pad - m.shape[0]), (0, 0)), constant_values=1)


def _prep_weights(geom, weights, cdtype):
    """Cast to compute dtype (f32 LN params stay f32 — they multiply f32
    values in-kernel) and lift 1-D vectors to (1, N) blocks."""
    names = DEC_WEIGHTS if geom.has_cross else ENC_WEIGHTS
    out = []
    for n, w in zip(names, weights):
        if n.startswith("w"):
            w = w.astype(cdtype)
        else:
            w = w.astype(jnp.float32)
        if w.ndim == 1:
            w = w.reshape(1, -1)
        out.append(w)
    return out


def _wspecs(ws):
    # nd bound via default arg: a plain closure over the loop variable would
    # make every lambda see the LAST weight's ndim (safe today only because
    # _prep_weights lifts all weights to 2-D)
    return [
        pl.BlockSpec(w.shape, lambda i, seed, nd=w.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in ws
    ]


def _flop_estimate(geom, rows_total, backward):
    H, F = geom.hidden, geom.intermediate
    proj = 2 * rows_total * H * (3 * H + H + 2 * F)
    if geom.has_cross:
        proj += 2 * rows_total * H * (H + 2 * H + H)
    attn = 4 * rows_total * (geom.block_b_fwd * geom.s_q) * H
    fwd = proj + attn
    return fwd * (3 if backward else 1)


def _layer_forward(geom, x, enc, smask, cmask, seed, weights, interpret, save="none"):
    interpret = _resolve_interpret(interpret)
    b, s_q, H = x.shape
    tb = min(geom.block_b_fwd, b)
    geom = dataclasses.replace(geom, block_b_fwd=tb)
    if geom.attn_chunk_fwd > 0:
        # forward-only chunk override (backward keeps geom.attn_chunk)
        geom = dataclasses.replace(geom, attn_chunk=geom.attn_chunk_fwd)
    b_pad = ((b + tb - 1) // tb) * tb
    grid = b_pad // tb
    cdtype = x.dtype

    xp = _pad_rows(x, b_pad)
    sm = _pad_mask(smask, b_pad).astype(jnp.int32).reshape(grid, 1, tb * s_q)
    inputs = [xp]
    xspec = pl.BlockSpec((tb, s_q, H), lambda i, seed: (i, 0, 0), memory_space=pltpu.VMEM)
    especs = [xspec]
    if geom.has_cross:
        ep = _pad_rows(enc.astype(cdtype), b_pad)
        inputs.append(ep)
        especs.append(pl.BlockSpec((tb, geom.s_k, H), lambda i, seed: (i, 0, 0),
                                   memory_space=pltpu.VMEM))
    inputs.append(sm)
    especs.append(pl.BlockSpec((1, 1, tb * s_q), lambda i, seed: (i, 0, 0),
                               memory_space=pltpu.VMEM))
    if geom.has_cross:
        cm = _pad_mask(cmask, b_pad).astype(jnp.int32).reshape(grid, 1, tb * geom.s_k)
        inputs.append(cm)
        especs.append(pl.BlockSpec((1, 1, tb * geom.s_k), lambda i, seed: (i, 0, 0),
                                   memory_space=pltpu.VMEM))
    ws = _prep_weights(geom, weights, cdtype)
    inputs.extend(ws)
    especs.extend(_wspecs(ws))

    out_shapes = [jax.ShapeDtypeStruct((b_pad, s_q, H), cdtype)]
    out_specs = [xspec]
    if save != "none":
        for name, s_dim, width, kind in _res_layout(geom, save):
            dt = cdtype if kind == "c" else jnp.float32
            out_shapes.append(jax.ShapeDtypeStruct((b_pad, s_dim, width), dt))
            out_specs.append(pl.BlockSpec((tb, s_dim, width), lambda i, seed: (i, 0, 0),
                                          memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_layer_fwd_kernel, geom, save),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=especs,
            out_specs=out_specs if save != "none" else out_specs[0],
        ),
        out_shape=out_shapes if save != "none" else out_shapes[0],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=_flop_estimate(geom, b_pad * s_q, False),
            bytes_accessed=2 * b_pad * s_q * H * x.dtype.itemsize,
            transcendentals=b_pad * s_q * (geom.intermediate + tb * s_q * geom.num_heads),
        ),
    )(seed, *inputs)
    if save != "none":
        return outs[0][:b], tuple(outs[1:])
    return outs[:b]


def _layer_backward(geom, x, enc, smask, cmask, seed, weights, gy, interpret,
                    out=None, res=None, mode="none"):
    interpret = _resolve_interpret(interpret)
    save = mode
    b, s_q, H = x.shape
    tb = min(geom.block_b_bwd, b)
    geom = dataclasses.replace(geom, block_b_bwd=tb)
    b_pad = ((b + tb - 1) // tb) * tb
    grid = b_pad // tb
    cdtype = x.dtype
    names = DEC_WEIGHTS if geom.has_cross else ENC_WEIGHTS

    xp = _pad_rows(x, b_pad)
    gp = _pad_rows(gy.astype(cdtype), b_pad)  # zero-padded rows -> zero dW contributions
    sm = _pad_mask(smask, b_pad).astype(jnp.int32).reshape(grid, 1, tb * s_q)
    xspec = pl.BlockSpec((tb, s_q, H), lambda i, seed: (i, 0, 0), memory_space=pltpu.VMEM)

    inputs, especs = [xp], [xspec]
    if geom.has_cross:
        inputs.append(_pad_rows(enc.astype(cdtype), b_pad))
        especs.append(pl.BlockSpec((tb, geom.s_k, H), lambda i, seed: (i, 0, 0),
                                   memory_space=pltpu.VMEM))
    inputs.append(sm)
    especs.append(pl.BlockSpec((1, 1, tb * s_q), lambda i, seed: (i, 0, 0),
                               memory_space=pltpu.VMEM))
    if geom.has_cross:
        cm = _pad_mask(cmask, b_pad).astype(jnp.int32).reshape(grid, 1, tb * geom.s_k)
        inputs.append(cm)
        especs.append(pl.BlockSpec((1, 1, tb * geom.s_k), lambda i, seed: (i, 0, 0),
                                   memory_space=pltpu.VMEM))
    inputs.append(gp)
    especs.append(xspec)
    if save != "none":
        def fit(a):
            # fwd may have padded with a different tile size
            return a if a.shape[0] == b_pad else _pad_rows(a[:b], b_pad)

        inputs.append(fit(out.astype(cdtype)))
        especs.append(xspec)
        for (name, s_dim, width, _), r in zip(_res_layout(geom, save), res):
            inputs.append(fit(r))
            especs.append(pl.BlockSpec((tb, s_dim, width), lambda i, seed: (i, 0, 0),
                                       memory_space=pltpu.VMEM))
    ws = _prep_weights(geom, weights, cdtype)
    inputs.extend(ws)
    especs.extend(_wspecs(ws))

    out_shapes = [jax.ShapeDtypeStruct((b_pad, s_q, H), cdtype)]
    out_specs = [xspec]
    if geom.has_cross:
        # cotangent dtype must match the PRIMAL enc dtype (e.g. f32 z_q fed
        # into a bf16 trunk), not the compute dtype
        out_shapes.append(jax.ShapeDtypeStruct((b_pad, geom.s_k, H), enc.dtype))
        out_specs.append(pl.BlockSpec((tb, geom.s_k, H), lambda i, seed: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    for n, w in zip(names, ws):
        # dW accumulators live in VMEM for the whole grid; matmul-kernel
        # accums use the prepped weight dtype (compute dtype — their VJP
        # cotangent is rounded to it anyway since the trunk casts weights
        # pre-scan), halving the dominant VMEM cost in bf16 runs. LN/bias
        # accums are f32 (tiny).
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, w.dtype))
        out_specs.append(pl.BlockSpec(w.shape, lambda i, seed, nd=w.ndim: (0,) * nd,
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_layer_bwd_kernel, geom, save),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=especs,
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the dW accumulators (+ weights) dominate the bwd kernel's Mosaic
            # stack; give it the whole chip VMEM minus a small margin
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=_flop_estimate(geom, b_pad * s_q, True),
            bytes_accessed=4 * b_pad * s_q * H * x.dtype.itemsize,
            transcendentals=2 * b_pad * s_q * (geom.intermediate + tb * s_q * geom.num_heads),
        ),
    )(seed, *inputs)

    dx = outs[0][:b]
    idx = 1
    denc = None
    if geom.has_cross:
        denc = outs[idx][:b]
        idx += 1
    dws = []
    for n, w in zip(names, weights):
        dw = outs[idx]
        idx += 1
        if w.ndim == 1:
            dw = dw.reshape(-1)
        dws.append(dw.astype(w.dtype))
    return dx, denc, tuple(dws)


def _layer_backward_xla(geom, x, enc, smask, cmask, seed, weights, gy, out, res,
                        interpret):
    """Backward from saved fwd residuals, as plain XLA ops + the standalone
    attention-bwd kernels. Everything here is a large packed-rows dense op
    ((B*S, H) LayerNorm/gelu grads, (B*S, H)x(H, N) dgrads, (H, B*S)x(B*S, N)
    wgrads) that XLA schedules at near-peak MXU — only the tiny-seq
    block-diagonal attention needs Pallas. This also removes the monolithic
    bwd kernel's dW-accumulator VMEM wall (37.8 MB f32 at bert-base)."""
    g = geom
    b, s_q, H = x.shape
    rows = b * s_q
    cdtype = x.dtype
    names = DEC_WEIGHTS if g.has_cross else ENC_WEIGHTS
    W = dict(zip(names, _prep_weights(g, weights, cdtype)))
    seed_s, tile0 = seed[0], jnp.uint32(0)

    R = {}
    for (name, s_dim, width, _), r in zip(_res_layout(g), res):
        R[name] = r[:b].reshape(b * s_dim, width)
    invs = R.pop("invs")
    inv1, inv3 = invs[:, 0:1], invs[:, 2:3]
    yhat1 = _ln_recover_yhat(R["x1"], W["g1"], W["be1"])
    if g.has_cross:
        inv2 = invs[:, 1:2]
        yhat2 = _ln_recover_yhat(R["x2"], W["g2"], W["be2"])
    yhat3 = _ln_recover_yhat(out[:b].reshape(rows, H), W["g3"], W["be3"])
    u = R["u_c"].astype(jnp.float32)
    m_c = _gelu_fwd(u, g.gelu_exact).astype(cdtype)

    x2d = x.reshape(rows, H)
    gy2 = gy.reshape(rows, H).astype(jnp.float32)
    dW = {}

    # ---- MLP block backward
    dW["g3"] = jnp.sum(gy2 * yhat3, axis=0, keepdims=True)
    dW["be3"] = jnp.sum(gy2, axis=0, keepdims=True)
    dr3 = _ln_bwd(gy2, yhat3, inv3, W["g3"])
    if g.hid_rate > 0.0:
        k3 = _keep_2d(seed_s, tile0, 1002, rows, H, g.hid_rate)
        dy = dr3 * k3
    else:
        dy = dr3
    dy_c = dy.astype(cdtype)
    dW["w2"] = _mm_tn(m_c, dy_c)
    dW["b2"] = jnp.sum(dy, axis=0, keepdims=True)
    dm = _mm_nt(dy_c, W["w2"])
    du = dm * _gelu_grad(u, g.gelu_exact)
    du_c = du.astype(cdtype)
    xm = R["x2"] if g.has_cross else R["x1"]
    dW["w1"] = _mm_tn(xm, du_c)
    dW["b1"] = jnp.sum(du, axis=0, keepdims=True)
    dxm = dr3 + _mm_nt(du_c, W["w1"])

    # ---- cross-attention block backward (decoder)
    if g.has_cross:
        dW["g2"] = jnp.sum(dxm * yhat2, axis=0, keepdims=True)
        dW["be2"] = jnp.sum(dxm, axis=0, keepdims=True)
        dr2 = _ln_bwd(dxm, yhat2, inv2, W["g2"])
        if g.hid_rate > 0.0:
            k2 = _keep_2d(seed_s, tile0, 1001, rows, H, g.hid_rate)
            da2 = dr2 * k2
        else:
            da2 = dr2
        da2_c = da2.astype(cdtype)
        dW["wco"] = _mm_tn(R["ctx2_c"], da2_c)
        dW["bco"] = jnp.sum(da2, axis=0, keepdims=True)
        dctx2 = _mm_nt(da2_c, W["wco"])
        dqc, dkvc = _attn_bwd_call(
            g, True, R["qc"].reshape(b, s_q, H), R["kvc"].reshape(b, g.s_k, 2 * H),
            cmask, seed, dctx2.reshape(b, s_q, H), interpret,
        )
        dqc_c = dqc.reshape(rows, H)
        dkv_c = dkvc.reshape(b * g.s_k, 2 * H)
        dW["wq"] = _mm_tn(R["x1"], dqc_c)
        dW["bq"] = jnp.sum(dqc_c.astype(jnp.float32), axis=0, keepdims=True)
        enc2d = enc.astype(cdtype).reshape(b * g.s_k, H)
        dW["wkv"] = _mm_tn(enc2d, dkv_c)
        dW["bkv"] = jnp.sum(dkv_c.astype(jnp.float32), axis=0, keepdims=True)
        denc = _mm_nt(dkv_c, W["wkv"]).reshape(b, g.s_k, H).astype(enc.dtype)
        dx1 = dr2 + _mm_nt(dqc_c, W["wq"])
    else:
        denc = None
        dx1 = dxm

    # ---- self-attention block backward
    dW["g1"] = jnp.sum(dx1 * yhat1, axis=0, keepdims=True)
    dW["be1"] = jnp.sum(dx1, axis=0, keepdims=True)
    dr1 = _ln_bwd(dx1, yhat1, inv1, W["g1"])
    if g.hid_rate > 0.0:
        k1 = _keep_2d(seed_s, tile0, 1000, rows, H, g.hid_rate)
        da1 = dr1 * k1
    else:
        da1 = dr1
    da1_c = da1.astype(cdtype)
    dW["wo"] = _mm_tn(R["ctx_c"], da1_c)
    dW["bo"] = jnp.sum(da1, axis=0, keepdims=True)
    dctx = _mm_nt(da1_c, W["wo"])
    dqkv = _attn_bwd_call(
        g, False, R["qkv_c"].reshape(b, s_q, 3 * H), None,
        smask, seed, dctx.reshape(b, s_q, H), interpret,
    )
    dqkv_c = dqkv.reshape(rows, 3 * H)
    dW["wqkv"] = _mm_tn(x2d, dqkv_c)
    dW["bqkv"] = jnp.sum(dqkv_c.astype(jnp.float32), axis=0, keepdims=True)
    dx = (dr1 + _mm_nt(dqkv_c, W["wqkv"])).reshape(b, s_q, H).astype(x.dtype)

    dws = []
    for n, w in zip(names, weights):
        d = dW[n]
        if w.ndim == 1:
            d = d.reshape(-1)
        dws.append(d.astype(w.dtype))
    return dx, denc, tuple(dws)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 6))
def fused_bert_layer(geom: LayerGeom, x, enc, smask, cmask, seed, interpret, *weights):
    """One whole post-LN BERT layer, fused. x (B,S,H); enc (B,S_k,H) or None;
    smask/cmask (B,S)/(B,S_k) key-validity ints or None; seed (1,) int32 for
    the in-kernel hash dropout (set rates to 0 in geom when deterministic).
    ``weights`` follow ENC_WEIGHTS/DEC_WEIGHTS order; grads flow to x, enc
    and every weight. Under differentiation with geom.save_residuals the fwd
    kernel streams its matmul outputs to HBM for the bwd kernel (the plain
    call never pays that traffic)."""
    if smask is None:
        smask = jnp.ones((x.shape[0], x.shape[1]), jnp.int32)
    if geom.has_cross and cmask is None:
        cmask = jnp.ones((x.shape[0], geom.s_k), jnp.int32)
    return _layer_forward(geom, x, enc, smask, cmask, seed, weights, interpret)


def _fbl_fwd(geom, x, enc, smask, cmask, seed, interpret, *weights):
    smask_ = smask
    if smask_ is None:
        smask_ = jnp.ones((x.shape[0], x.shape[1]), jnp.int32)
    cmask_ = cmask
    if geom.has_cross and cmask_ is None:
        cmask_ = jnp.ones((x.shape[0], geom.s_k), jnp.int32)
    mode = "full" if geom.save_residuals else "lite"
    out, res = _layer_forward(geom, x, enc, smask_, cmask_, seed, weights,
                              interpret, save=mode)
    return out, (x, enc, smask, cmask, seed, weights, res, out)


def _fbl_bwd(geom, interpret, saved, gy):
    x, enc, smask, cmask, seed, weights, res, out = saved
    if smask is None:
        smask = jnp.ones((x.shape[0], x.shape[1]), jnp.int32)
    if geom.has_cross and cmask is None:
        cmask = jnp.ones((x.shape[0], geom.s_k), jnp.int32)
    if geom.save_residuals and geom.xla_bwd:
        dx, denc, dws = _layer_backward_xla(geom, x, enc, smask, cmask, seed,
                                            weights, gy, out, res, interpret)
    else:
        mode = "full" if geom.save_residuals else "lite"
        dx, denc, dws = _layer_backward(geom, x, enc, smask, cmask, seed, weights,
                                        gy, interpret, out=out, res=res, mode=mode)
    return (dx, denc, None, None, None) + dws


fused_bert_layer.defvjp(_fbl_fwd, _fbl_bwd)
