"""In-kernel A/B of the fused forward's attention core vs the head-lane-
packed formulation (VERDICT r3 #5).

The fused layer's forward attention (_attn_fwd_tile, ops/layer_pallas.py)
loops over heads with tiny (rq, 64)x(64, rk) matmuls — at S=12, nc=4 the
score tiles are 48x48 with lanes padded to 128. The proven standalone
remedy (ops/attention_pallas.py head-lane packing: per key position, one
(rows, H)x(H, 128) MXU contraction scores ALL heads into lanes) measured
parity with XLA in isolation; this script measures it AGAINST the loop core
at the fused layer's exact in-kernel conditions: same tile geometry
(tbf sentences -> rows = tbf*S packed), bf16 compute, everything
VMEM-resident, dropout off, value-parity asserted. Both cores consume the
same (1, rows) key mask (the chunk-local bias construction shipped in
round 4 — the full-tile bias materialization this A/B originally targeted
is already gone).

    python scripts/ab_attn_core.py [--tbf 128] [--nc 4] [--inner 50]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _loop_core_kernel(nh, hd, tb, s, nc, q_ref, k_ref, v_ref, m_ref, o_ref):
    from kindergarten_vq_vae_tpu.ops.layer_pallas import _attn_fwd_tile

    ctx = _attn_fwd_tile(
        q_ref[:], k_ref[:], v_ref[:], m_ref[0], False,
        jnp.uint32(0), jnp.int32(0), 0,
        nh, hd, tb, s, s, 0.0, jnp.bfloat16, nc,
    )
    o_ref[:] = ctx.astype(o_ref.dtype)


def _packed_core_kernel(nh, hd, tb, s, q_ref, k_ref, v_ref, m_ref, o_ref):
    """Head-lane packing at in-fused-layer conditions: q/k/v arrive as the
    layer kernel holds them — packed (tb*s, H) rows — and the block-diagonal
    structure is handled per key position j (each sentence's q rows see only
    its own key j), matching ops/attention_pallas._mha_kernel's math.

    The key mask arrives as (rows, s): m[r, j] = validity of key position j
    for row r's sentence — per-j extraction is then a static column slice
    (a (1, rows) -> (tb, s) reshape inside the kernel is an unsupported
    Mosaic shape cast, measured on-chip)."""
    lanes = 128
    hidden = nh * hd
    rows = tb * s
    scale = 1.0 / float(np.sqrt(hd))
    q = q_ref[:]
    # (hidden, 128) block-sum constant built in-kernel from iota (no extra
    # operand plumbing): sum_h[r, l] = 1 where r // hd == l
    r_i = jax.lax.broadcasted_iota(jnp.int32, (hidden, lanes), 0)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (hidden, lanes), 1)
    sum_h = (r_i // hd == l_i).astype(jnp.bfloat16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    head_valid = lane < nh

    kv = m_ref[0]  # (rows, s) key mask (see docstring)

    # SINGLE-PASS softmax over key positions: only z and acc stay live
    # across j. The first (two-pass, max-subtracted) formulation kept all
    # 12 (rows, 128) score tiles + exp tiles live through the unrolled
    # loops — the register allocator spilled 113.6 MB of stack and the
    # kernel exceeded the chip's entire 128 MB vmem (measured). Scores at
    # S=12/hd=64 are O(10), so exp without max-subtraction is safe in f32;
    # normalization happens once at the end (mathematically identical).
    exp_h = sum_h.T  # (128, hidden)
    exp_h32 = exp_h.astype(jnp.float32)
    z = jnp.zeros((rows, lanes), jnp.float32)
    acc = jnp.zeros((rows, hidden), jnp.float32)
    for j in range(s):
        k_j = k_ref[:].reshape(tb, s, hidden)[:, j, :]
        k_b = jnp.broadcast_to(k_j[:, None, :], (tb, s, hidden)).reshape(rows, hidden)
        prod = q * k_b
        s_j = jax.lax.dot_general(
            prod, sum_h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        kv_rows = kv[:, j:j + 1]  # (rows, 1) static column slice
        s_j = jnp.where(kv_rows > 0, s_j, -1e9)
        s_j = jnp.where(head_valid, s_j, -1e9)
        e_j = jnp.exp(s_j)
        z = z + e_j
        p_exp = jax.lax.dot_general(
            e_j.astype(jnp.bfloat16), exp_h,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        v_j = v_ref[:].reshape(tb, s, hidden)[:, j, :]
        v_b = jnp.broadcast_to(v_j[:, None, :], (tb, s, hidden)).reshape(rows, hidden)
        acc = acc + p_exp * v_b.astype(jnp.float32)
    # invalid head lanes never accumulate (exp_h row is all-zero) but their
    # z is 0 — pin to 1 so inv_z stays finite through the expansion matmul
    inv_z = 1.0 / jnp.where(head_valid, z, 1.0)
    inv_exp = jax.lax.dot_general(
        inv_z, exp_h32, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = (acc * inv_exp).astype(o_ref.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tbf", type=int, default=128, help="sentences per tile (fused fwd default)")
    ap.add_argument("--nc", type=int, default=4, help="loop-core attention chunk (fused fwd default)")
    ap.add_argument("--s", type=int, default=12)
    ap.add_argument("--nh", type=int, default=12)
    ap.add_argument("--hd", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2048, help="total sentences (grid = batch/tbf)")
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    nh, hd, s, tb = args.nh, args.hd, args.s, args.tbf
    hidden = nh * hd
    rows = tb * s
    grid = args.batch // tb

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(grid * rows, hidden)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(grid * rows, hidden)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(grid * rows, hidden)), jnp.bfloat16)
    mask = jnp.ones((grid, 1, rows), jnp.int32)
    # packed-core mask layout: (rows, s) per grid step (kernel docstring)
    mask_rs = jnp.ones((grid, rows, s), jnp.int32)

    rowspec = pl.BlockSpec((rows, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec_rs = pl.BlockSpec((1, rows, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def call(kernel_body, m_arr, m_spec):
        f = pl.pallas_call(
            kernel_body, grid=(grid,), in_specs=[rowspec] * 3 + [m_spec],
            out_specs=rowspec,
            out_shape=jax.ShapeDtypeStruct((grid * rows, hidden), jnp.bfloat16),
            interpret=args.interpret,
        )
        return lambda q, k, v: f(q, k, v, m_arr)

    loop_fn = call(functools.partial(_loop_core_kernel, nh, hd, tb, s, args.nc),
                   mask, mspec)
    packed_fn = call(functools.partial(_packed_core_kernel, nh, hd, tb, s),
                     mask_rs, mspec_rs)

    # raised scoped-vmem budget (CLAUDE.md: jits containing the fused
    # kernels need it; the 128-sentence tile's VMEM stack is ~18 MiB)
    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

    copts = tpu_compiler_options()

    # value parity (all-ones mask -> identical math up to bf16 rounding)
    o_l = np.asarray(jax.jit(loop_fn, compiler_options=copts)(q, k, v), np.float32)
    o_p = np.asarray(jax.jit(packed_fn, compiler_options=copts)(q, k, v), np.float32)
    err = np.max(np.abs(o_l - o_p))
    print(f"value parity: max abs diff {err:.3e}")
    assert err < 0.1, "core mismatch"

    def timed(fn, label):
        @functools.partial(jax.jit, compiler_options=copts)
        def chain(q0):
            def body(c, _):
                out = fn(c, k, v)
                return out, ()

            c, _ = jax.lax.scan(body, q0, None, length=args.inner)
            return c

        c = chain(q)
        jax.block_until_ready(c)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            c = chain(q)
            float(jnp.sum(c[:1, :1]))
            dt = (time.perf_counter() - t0) / args.inner * 1e6
            best = dt if best is None else min(best, dt)
        print(f"{label:24s}: {best:8.1f} us/call")
        return best

    t_l = timed(loop_fn, f"loop core (nc={args.nc})")
    t_p = timed(packed_fn, "packed core")
    print(f"packed vs loop: {t_l / t_p:.2f}x")


if __name__ == "__main__":
    main()
