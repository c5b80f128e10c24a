"""Block-diagonal fused SDPA kernel (ops/sdpa_pallas.py): value + gradient
parity vs the einsum oracle, cross-attention shapes, causal masking, batch
padding, and hash-dropout determinism / gradient exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kindergarten_vq_vae_tpu.ops.attention_pallas import _mha_reference
from kindergarten_vq_vae_tpu.ops.sdpa_pallas import fused_sdpa

SEED0 = jnp.asarray([7], jnp.int32)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("block_b", [2, 3, 8])
def test_value_parity(causal, block_b):
    rng = np.random.default_rng(0)
    B, S, H, NH = 5, 12, 64, 4
    q, k, v = (_rand(rng, B, S, H) for _ in range(3))
    mask = np.asarray(rng.integers(0, 2, (B, S)), np.int32)
    mask[:, 0] = 1  # CLS always valid, like real batches
    mask = jnp.asarray(mask)
    out = fused_sdpa(q, k, v, mask, SEED0, NH, causal, 0.0, block_b)
    ref = _mha_reference(q, k, v, mask, NH, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grad_parity(causal):
    rng = np.random.default_rng(1)
    B, S, H, NH = 4, 12, 64, 4
    q, k, v = (_rand(rng, B, S, H) for _ in range(3))
    mask = jnp.ones((B, S), jnp.int32)
    w = _rand(rng, B, S, H)

    def lf(q_, k_, v_):
        return jnp.sum(fused_sdpa(q_, k_, v_, mask, SEED0, NH, causal, 0.0, 2) * w)

    def lr(q_, k_, v_):
        return jnp.sum(_mha_reference(q_, k_, v_, mask, NH, causal) * w)

    gf = jax.grad(lf, (0, 1, 2))(q, k, v)
    gr = jax.grad(lr, (0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_cross_attention_shapes():
    """S_q != S_k (decoder queries over encoder keys), with key mask."""
    rng = np.random.default_rng(2)
    B, SQ, SK, H, NH = 3, 7, 12, 32, 4
    q = _rand(rng, B, SQ, H)
    k, v = _rand(rng, B, SK, H), _rand(rng, B, SK, H)
    mask = np.asarray(rng.integers(0, 2, (B, SK)), np.int32)
    mask[:, 0] = 1
    mask = jnp.asarray(mask)

    d = H // NH
    qh = q.reshape(B, SQ, NH, d)
    kh = k.reshape(B, SK, NH, d)
    vh = v.reshape(B, SK, NH, d)
    sc = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
    sc = jnp.where(mask[:, None, None, :] > 0, sc, -1e9)
    p = jax.nn.softmax(sc, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, SQ, H)

    out = fused_sdpa(q, k, v, mask, SEED0, NH, False, 0.0, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # grads too
    w = _rand(rng, B, SQ, H)
    gf = jax.grad(lambda q_: jnp.sum(fused_sdpa(q_, k, v, mask, SEED0, NH, False, 0.0, 2) * w))(q)

    def lr(q_):
        qh = q_.reshape(B, SQ, NH, d)
        sc = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
        sc = jnp.where(mask[:, None, None, :] > 0, sc, -1e9)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, SQ, H) * w)

    gr = jax.grad(lr)(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-5)


def test_batch_padding():
    """B not a multiple of block_b: padded rows must not affect real ones."""
    rng = np.random.default_rng(3)
    B, S, H, NH = 5, 6, 32, 4
    q, k, v = (_rand(rng, B, S, H) for _ in range(3))
    mask = jnp.ones((B, S), jnp.int32)
    out_pad = fused_sdpa(q, k, v, mask, SEED0, NH, False, 0.0, 4)  # pads 5 -> 8
    out_one = fused_sdpa(q, k, v, mask, SEED0, NH, False, 0.0, 1)  # exact tiles
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_one), atol=1e-5)


def test_dropout_determinism_and_rate():
    rng = np.random.default_rng(4)
    B, S, H, NH = 8, 12, 64, 8
    q, k, v = (_rand(rng, B, S, H) for _ in range(3))
    mask = jnp.ones((B, S), jnp.int32)
    rate = 0.3
    s0, s1 = jnp.asarray([7], jnp.int32), jnp.asarray([8], jnp.int32)
    o1 = fused_sdpa(q, k, v, mask, s0, NH, False, rate, 4)
    o2 = fused_sdpa(q, k, v, mask, s0, NH, False, rate, 4)
    o3 = fused_sdpa(q, k, v, mask, s1, NH, False, rate, 4)
    assert bool(jnp.all(o1 == o2)), "same seed must be bit-deterministic"
    assert not bool(jnp.all(o1 == o3)), "different seed must give different masks"

    # keep-rate statistics: use identity-ish v to expose the mask scale.
    # E[output] == no-dropout output; check the empirical mean ratio.
    o0 = fused_sdpa(q, k, v, mask, s0, NH, False, 0.0, 4)
    assert float(jnp.abs(o1 - o0).mean()) > 0.01, "dropout must perturb"
    # averaging over many seeds approaches the deterministic output
    acc = jnp.zeros_like(o0)
    n = 16
    for i in range(n):
        acc = acc + fused_sdpa(q, k, v, mask, jnp.asarray([100 + i], jnp.int32), NH, False, rate, 4)
    resid = float(jnp.abs(acc / n - o0).mean()) / float(jnp.abs(o0).mean())
    assert resid < 0.25, f"dropout mean should approach no-dropout output, resid={resid}"


def test_dropout_grads_finite_diff():
    """With a fixed seed the op is deterministic piecewise-linear -> finite
    differences must match the custom-VJP gradients exactly (fwd and bwd use
    the same hash masks by construction)."""
    rng = np.random.default_rng(5)
    B, S, H, NH = 4, 6, 32, 4
    q, k, v = (_rand(rng, B, S, H) for _ in range(3))
    mask = jnp.ones((B, S), jnp.int32)
    w = _rand(rng, B, S, H)
    rate = 0.3

    def f(q_, k_, v_):
        return jnp.sum(fused_sdpa(q_, k_, v_, mask, SEED0, NH, False, rate, 2) * w)

    g = jax.grad(f, (0, 1, 2))(q, k, v)
    eps = 1e-3
    arrs = [q, k, v]
    for argi in range(3):
        for idx in [(0, 1, 3), (2, 4, 17), (3, 5, 31)]:
            d = jnp.zeros_like(arrs[argi]).at[idx].set(eps)
            ap = [a if i != argi else a + d for i, a in enumerate(arrs)]
            am = [a if i != argi else a - d for i, a in enumerate(arrs)]
            fd = float((f(*ap) - f(*am)) / (2 * eps))
            an = float(g[argi][idx])
            assert abs(an - fd) < 1e-2 * max(1.0, abs(an)), (argi, idx, an, fd)


def test_all_heads_bert_base_geometry():
    """12 heads x 64 dim (bert-base) on a small batch."""
    rng = np.random.default_rng(6)
    B, S, H, NH = 4, 12, 768, 12
    q, k, v = (_rand(rng, B, S, H) for _ in range(3))
    mask = jnp.ones((B, S), jnp.int32)
    out = fused_sdpa(q, k, v, mask, SEED0, NH, False, 0.0, 2)
    ref = _mha_reference(q, k, v, mask, NH, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
