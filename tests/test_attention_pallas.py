"""Fused tiny-seq MHA kernel: value + gradient parity vs the einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kindergarten_vq_vae_tpu.ops.attention_pallas import _mha_reference, fused_mha


def _inputs(b=8, s=12, h=12, d=64, seed=0):
    rng = np.random.default_rng(seed)
    H = h * d
    q = jnp.asarray(rng.normal(size=(b, s, H)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, H)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[0, -3:] = 0
    return q, k, v, jnp.asarray(mask), h


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_mha_matches_reference(causal, with_mask):
    q, k, v, mask, h = _inputs()
    m = mask if with_mask else None
    out = fused_mha(q, k, v, m, h, causal)
    ref = _mha_reference(q, k, v, m, h, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_mha_gradients():
    q, k, v, mask, h = _inputs(b=4)

    def L(q_, k_, v_):
        return jnp.sum(fused_mha(q_, k_, v_, mask, h, True) * 0.3)

    def Lr(q_, k_, v_):
        return jnp.sum(_mha_reference(q_, k_, v_, mask, h, True) * 0.3)

    g = jax.grad(L, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(Lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_fused_mha_odd_batch_and_jit():
    # batch not a multiple of the tile; jit wrapper
    q, k, v, mask, h = _inputs(b=5)

    @jax.jit
    def f(q_, k_, v_):
        return fused_mha(q_, k_, v_, mask, h, False, 4)

    out = f(q, k, v)
    ref = _mha_reference(q, k, v, mask, h, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_mha_nonsquare_heads():
    # 4 heads of 32 (hidden 128)
    q, k, v, mask, h = _inputs(b=4, h=4, d=32)
    out = fused_mha(q, k, v, mask, 4, False)
    ref = _mha_reference(q, k, v, mask, 4, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
