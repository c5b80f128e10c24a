"""Golden parity: Flax GPT-2 decoder (with cross-attention) vs HF torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kindergarten_vq_vae_tpu.nn.gpt2 import (
    GPT2Config,
    GPT2LMHeadModel,
    convert_gpt2_state_dict,
)

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def _cfgs():
    ours = GPT2Config(
        vocab_size=101,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        max_position_embeddings=64,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        add_cross_attention=True,
    )
    hf = transformers.GPT2Config(
        vocab_size=101,
        n_embd=32,
        n_layer=2,
        n_head=2,
        n_positions=64,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        add_cross_attention=True,
    )
    return ours, hf


def test_gpt2_decoder_parity_with_hf():
    ours, hf_cfg = _cfgs()
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()

    # fresh init to supply any missing subtrees
    rng = np.random.default_rng(0)
    ids = rng.integers(1, ours.vocab_size, (3, 10))
    mask = np.ones((3, 10), np.int64)
    mask[0, -2:] = 0
    enc_hidden = rng.normal(size=(3, 10, ours.hidden_size)).astype(np.float32)

    model = GPT2LMHeadModel(ours)
    fresh = model.init(
        jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask),
        encoder_hidden_states=jnp.asarray(enc_hidden),
    )["params"]
    params = convert_gpt2_state_dict(hf.state_dict(), ours, fresh)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    with torch.no_grad():
        ref = hf(
            torch.as_tensor(ids),
            attention_mask=torch.as_tensor(mask),
            encoder_hidden_states=torch.as_tensor(enc_hidden),
            output_attentions=True,
        )
    out = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        encoder_hidden_states=jnp.asarray(enc_hidden), output_attentions=True,
    )
    np.testing.assert_allclose(np.asarray(out["logits"]), ref.logits.numpy(), rtol=3e-4, atol=3e-5)
    hf_cross = ref.cross_attentions or ()
    for j_attn, t_attn in zip(out["cross_attentions"], hf_cross):
        if t_attn is not None:
            np.testing.assert_allclose(np.asarray(j_attn), t_attn.numpy(), rtol=3e-4, atol=3e-5)


def test_gpt2_warm_start_without_cross_attention():
    """Plain GPT-2 LM checkpoint: cross-attn subtrees keep fresh init."""
    ours, hf_cfg = _cfgs()
    torch.manual_seed(1)
    hf = transformers.GPT2LMHeadModel(hf_cfg)
    sd = {k: v for k, v in hf.state_dict().items()
          if "crossattention" not in k and "ln_cross_attn" not in k}

    model = GPT2LMHeadModel(ours)
    ids = jnp.zeros((1, 8), jnp.int32)
    fresh = model.init(
        jax.random.key(3), ids, jnp.ones_like(ids),
        encoder_hidden_states=jnp.zeros((1, 8, ours.hidden_size)),
    )["params"]
    params = convert_gpt2_state_dict(sd, ours, fresh)
    np.testing.assert_allclose(
        np.asarray(params["layer_0"]["c_attn"]["kernel"]),
        sd["transformer.h.0.attn.c_attn.weight"].numpy(),
    )
    # fresh cross-attn retained and finite
    assert np.isfinite(np.asarray(params["layer_0"]["q_attn"]["kernel"])).all()


def test_gpt2_causal():
    ours, _ = _cfgs()
    model = GPT2LMHeadModel(ours)
    ids1 = jnp.asarray([[5, 6, 7, 8, 9, 10, 11, 12]])
    ids2 = ids1.at[0, -1].set(42)
    mask = jnp.ones_like(ids1)
    enc_h = jnp.zeros((1, 8, ours.hidden_size))
    params = model.init(jax.random.key(0), ids1, mask, encoder_hidden_states=enc_h)["params"]
    l1 = model.apply({"params": params}, ids1, mask, encoder_hidden_states=enc_h)["logits"]
    l2 = model.apply({"params": params}, ids2, mask, encoder_hidden_states=enc_h)["logits"]
    np.testing.assert_allclose(np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), atol=1e-6)
    assert not np.allclose(np.asarray(l1[:, -1]), np.asarray(l2[:, -1]))
