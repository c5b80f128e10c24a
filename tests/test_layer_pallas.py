"""Fused whole-layer kernel (ops/layer_pallas.py): value + full gradient
parity (x, enc, and every weight/bias/LN param) vs the nn/bert.py BertLayer
oracle, encoder and decoder geometries, batch padding, and hash-dropout
behavior. Runs in interpret mode on the CPU mesh (conftest pins cpu)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kindergarten_vq_vae_tpu.nn.bert import BertConfig, BertLayer
from kindergarten_vq_vae_tpu.ops.layer_pallas import (
    DEC_WEIGHTS,
    ENC_WEIGHTS,
    LayerGeom,
    fused_bert_layer,
)

SEED0 = jnp.asarray([11], jnp.int32)


def _cfg(decoder: bool, H=64, NH=4, F=128, S=12):
    return BertConfig(
        hidden_size=H, num_heads=NH, intermediate_size=F, num_layers=1,
        is_decoder=decoder, add_cross_attention=decoder,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
    )


def _geom(cfg: BertConfig, s_q, s_k, attn_rate=0.0, hid_rate=0.0, tbf=4, tbb=2):
    return LayerGeom(
        num_heads=cfg.num_heads, head_dim=cfg.head_dim, s_q=s_q, s_k=s_k,
        intermediate=cfg.intermediate_size, causal=cfg.is_decoder,
        has_cross=cfg.add_cross_attention, attn_rate=attn_rate,
        hid_rate=hid_rate, eps=cfg.layer_norm_eps, gelu_exact=cfg.gelu_exact,
        block_b_fwd=tbf, block_b_bwd=tbb,
    )


def _weights_from_params(params, decoder: bool):
    p = params
    ws = [
        p["self_attn"]["qkv"]["kernel"], p["self_attn"]["qkv"]["bias"],
        p["self_attn"]["out"]["kernel"], p["self_attn"]["out"]["bias"],
        p["self_attn"]["layer_norm"]["scale"], p["self_attn"]["layer_norm"]["bias"],
    ]
    if decoder:
        ws += [
            p["cross_attn"]["q"]["kernel"], p["cross_attn"]["q"]["bias"],
            p["cross_attn"]["kv"]["kernel"], p["cross_attn"]["kv"]["bias"],
            p["cross_attn"]["out"]["kernel"], p["cross_attn"]["out"]["bias"],
            p["cross_attn"]["layer_norm"]["scale"], p["cross_attn"]["layer_norm"]["bias"],
        ]
    ws += [
        p["mlp"]["intermediate"]["kernel"], p["mlp"]["intermediate"]["bias"],
        p["mlp"]["output"]["kernel"], p["mlp"]["output"]["bias"],
        p["mlp"]["layer_norm"]["scale"], p["mlp"]["layer_norm"]["bias"],
    ]
    names = DEC_WEIGHTS if decoder else ENC_WEIGHTS
    assert len(ws) == len(names)
    return tuple(ws)


def _setup(decoder: bool, B=5, S=12, SK=12, seed=0):
    rng = np.random.default_rng(seed)
    cfg = _cfg(decoder)
    layer = BertLayer(cfg)
    x = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)), jnp.float32)
    enc = (
        jnp.asarray(rng.normal(size=(B, SK, cfg.hidden_size)), jnp.float32)
        if decoder else None
    )
    mask = np.asarray(rng.integers(0, 2, (B, S)), np.int32)
    mask[:, 0] = 1
    mask = jnp.asarray(mask)
    params = layer.init(
        jax.random.key(3), x, mask, enc, None, True, False
    )["params"]
    return cfg, layer, x, enc, mask, params


@pytest.mark.parametrize("decoder", [False, True])
def test_value_parity(decoder):
    cfg, layer, x, enc, mask, params = _setup(decoder)
    ref, _, _ = layer.apply({"params": params}, x, mask, enc, None, True, False)
    geom = _geom(cfg, x.shape[1], enc.shape[1] if decoder else x.shape[1])
    ws = _weights_from_params(params, decoder)
    out = fused_bert_layer(geom, x, enc, mask, None, SEED0, None, *ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("decoder", [False, True])
@pytest.mark.parametrize("mode", ["save", "recompute", "xla"])
def test_full_gradient_parity(decoder, mode):
    """Grads wrt x, enc AND every weight must match the flax oracle — in all
    three backward modes (streamed-residual kernel, full per-tile recompute
    kernel, and the XLA-chain fallback)."""
    cfg, layer, x, enc, mask, params = _setup(decoder, B=4)
    geom = _geom(cfg, x.shape[1], enc.shape[1] if decoder else x.shape[1])
    geom = dataclasses.replace(geom, save_residuals=mode != "recompute",
                               xla_bwd=mode == "xla")
    rng = np.random.default_rng(7)
    cot = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def loss_ref(params_, x_, enc_):
        out, _, _ = layer.apply({"params": params_}, x_, mask, enc_, None, True, False)
        return jnp.sum(out * cot)

    def loss_fused(params_, x_, enc_):
        ws = _weights_from_params(params_, decoder)
        out = fused_bert_layer(geom, x_, enc_, mask, None, SEED0, None, *ws)
        return jnp.sum(out * cot)

    args = (params, x, enc) if decoder else (params, x, None)
    argnums = (0, 1, 2) if decoder else (0, 1)
    g_ref = jax.grad(loss_ref, argnums)(*args)
    g_fus = jax.grad(loss_fused, argnums)(*args)

    flat_ref, tdef_ref = jax.tree_util.tree_flatten(g_ref)
    flat_fus, tdef_fus = jax.tree_util.tree_flatten(g_fus)
    assert tdef_ref == tdef_fus
    paths = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    for (path, a), b in zip(paths, flat_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_batch_padding():
    """B not divisible by either tile size."""
    cfg, layer, x, enc, mask, params = _setup(True, B=7)
    ref, _, _ = layer.apply({"params": params}, x, mask, enc, None, True, False)
    geom = _geom(cfg, x.shape[1], enc.shape[1], tbf=4, tbb=4)
    ws = _weights_from_params(params, True)
    out = fused_bert_layer(geom, x, enc, mask, None, SEED0, None, *ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    # padded-row gradients must not pollute weight grads: compare dW against
    # an unpadded tile size that divides B
    def wgrad(tbb):
        g2 = dataclasses.replace(geom, block_b_bwd=tbb)

        def loss(ws_):
            return jnp.sum(fused_bert_layer(g2, x, enc, mask, None, SEED0, None, *ws_) ** 2)

        return jax.grad(loss)(ws)

    for a, b in zip(wgrad(4), wgrad(7)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-3)


def test_dropout_determinism_and_stats():
    """Hash dropout: same seed -> identical output; distinct seeds differ;
    train-mode mean stays near the deterministic output (unbiased)."""
    cfg, layer, x, enc, mask, params = _setup(True, B=4)
    geom = _geom(cfg, x.shape[1], enc.shape[1], attn_rate=0.1, hid_rate=0.1)
    ws = _weights_from_params(params, True)
    s1 = jnp.asarray([123], jnp.int32)
    s2 = jnp.asarray([456], jnp.int32)
    o1 = fused_bert_layer(geom, x, enc, mask, None, s1, None, *ws)
    o1b = fused_bert_layer(geom, x, enc, mask, None, s1, None, *ws)
    o2 = fused_bert_layer(geom, x, enc, mask, None, s2, None, *ws)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-4

    # gradient determinism: bwd recomputes the same masks from the seed
    def loss(ws_):
        return jnp.sum(fused_bert_layer(geom, x, enc, mask, None, s1, None, *ws_) ** 2)

    g1 = jax.grad(loss)(ws)
    g2 = jax.grad(loss)(ws)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("decoder", [False, True])
def test_attn_chunking_parity(decoder):
    """attn_chunk splits the packed attention into diagonal sub-blocks; the
    result (and the dropout stream — the chunk-local tile index reproduces
    the same global row hash) must be bit-identical to the unchunked tile."""
    cfg, layer, x, enc, mask, params = _setup(decoder, B=8)
    ws = _weights_from_params(params, decoder)
    s_k = enc.shape[1] if decoder else x.shape[1]
    base = _geom(cfg, x.shape[1], s_k, attn_rate=0.1, hid_rate=0.1, tbf=8, tbb=8)
    g_unchunked = dataclasses.replace(base, attn_chunk=8)
    g_chunked = dataclasses.replace(base, attn_chunk=2)
    seed = jnp.asarray([77], jnp.int32)
    o_ref = fused_bert_layer(g_unchunked, x, enc, mask, None, seed, None, *ws)
    o_chk = fused_bert_layer(g_chunked, x, enc, mask, None, seed, None, *ws)
    # tolerance is summation-order noise only: a single flipped dropout bit
    # would produce O(1) differences, so this still pins the hash stream
    np.testing.assert_allclose(np.asarray(o_chk), np.asarray(o_ref), atol=1e-5, rtol=1e-5)

    def loss(g):
        def f(ws_):
            return jnp.sum(fused_bert_layer(g, x, enc, mask, None, seed, None, *ws_) ** 2)
        return jax.grad(f)(ws)

    for a, b in zip(loss(g_unchunked), loss(g_chunked)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4)

    # and against the oracle with dropout off
    det = dataclasses.replace(base, attn_rate=0.0, hid_rate=0.0, attn_chunk=2)
    ref, _, _ = layer.apply({"params": params}, x, mask, enc, None, True, False)
    out = fused_bert_layer(det, x, enc, mask, None, seed, None, *ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("decoder", [False, True])
def test_attn_chunk_fwd_override(decoder):
    """attn_chunk_fwd decouples the forward's chunking from the backward's
    (a perf knob — the fwd and bwd kernels have different VMEM/occupancy
    trade-offs). Values and gradients must match the shared-chunk config
    with dropout ON: the hash keys on absolute row ids, so a mismatched
    fwd/bwd decomposition still reproduces identical keep masks."""
    cfg, layer, x, enc, mask, params = _setup(decoder, B=8)
    ws = _weights_from_params(params, decoder)
    s_k = enc.shape[1] if decoder else x.shape[1]
    base = _geom(cfg, x.shape[1], s_k, attn_rate=0.1, hid_rate=0.1, tbf=8, tbb=4)
    shared = dataclasses.replace(base, attn_chunk=4)
    split = dataclasses.replace(base, attn_chunk=4, attn_chunk_fwd=2)
    seed = jnp.asarray([91], jnp.int32)
    o_ref = fused_bert_layer(shared, x, enc, mask, None, seed, None, *ws)
    o_spl = fused_bert_layer(split, x, enc, mask, None, seed, None, *ws)
    np.testing.assert_allclose(np.asarray(o_spl), np.asarray(o_ref), atol=1e-5, rtol=1e-5)

    def grads(g):
        def f(ws_):
            return jnp.sum(fused_bert_layer(g, x, enc, mask, None, seed, None, *ws_) ** 2)
        return jax.grad(f)(ws)

    for a, b in zip(grads(shared), grads(split)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4)


def test_bert_base_geometry_smoke():
    """Full bert-base head/hidden geometry through both kernels (interpret)."""
    rng = np.random.default_rng(3)
    cfg = BertConfig(
        hidden_size=768, num_heads=12, intermediate_size=3072, num_layers=1,
        is_decoder=True, add_cross_attention=True,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
    )
    layer = BertLayer(cfg)
    B, S = 4, 12
    x = jnp.asarray(rng.normal(size=(B, S, 768)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(B, S, 768)), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)
    params = layer.init(jax.random.key(0), x, mask, enc, None, True, False)["params"]
    ref, _, _ = layer.apply({"params": params}, x, mask, enc, None, True, False)
    geom = _geom(cfg, S, S, tbf=2, tbb=2)
    ws = _weights_from_params(params, True)
    out = fused_bert_layer(geom, x, enc, mask, None, SEED0, None, *ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_model_level_fused_layer_parity():
    """BertLMHeadModel (decoder w/ cross-attn) with cfg.fused_layer: identical
    param tree to the unfused path, matching logits, matching grads."""
    rng = np.random.default_rng(5)
    base = dict(
        vocab_size=97, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, is_decoder=True, add_cross_attention=True,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
    )
    from kindergarten_vq_vae_tpu.nn.bert import BertLMHeadModel

    cfg_ref = BertConfig(**base)
    cfg_fused = BertConfig(fused_layer=True, layer_block_b_fwd=2,
                           layer_block_b_bwd=2, **base)
    B, S = 3, 12
    ids = jnp.asarray(rng.integers(1, 97, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    enc = jnp.asarray(rng.normal(size=(B, S, 64)), jnp.float32)

    m_ref, m_fused = BertLMHeadModel(cfg_ref), BertLMHeadModel(cfg_fused)
    p_ref = m_ref.init(jax.random.key(0), ids, mask, enc)["params"]
    p_fused = m_fused.init(jax.random.key(0), ids, mask, enc)["params"]
    # identical param trees (shapes AND paths) -> checkpoints interchangeable
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_fused)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_ref)[0],
        jax.tree_util.tree_flatten_with_path(p_fused)[0],
    ):
        assert a.shape == b.shape, jax.tree_util.keystr(path)

    out_ref = m_ref.apply({"params": p_ref}, ids, mask, enc)["logits"]
    out_fused = m_fused.apply({"params": p_ref}, ids, mask, enc)["logits"]
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=3e-4, rtol=3e-4
    )

    def loss(model, params):
        out = model.apply({"params": params}, ids, mask, enc)["logits"]
        return jnp.sum(out.astype(jnp.float32) ** 2) / out.size

    g_ref = jax.grad(lambda p: loss(m_ref, p))(p_ref)
    g_fused = jax.grad(lambda p: loss(m_fused, p))(p_ref)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-2,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
