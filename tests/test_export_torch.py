"""Reverse checkpoint bridge: run params -> reference torch .pth bundle.

The reference reloads ``{model,encoder,decoder}_state_dict`` bundles
everywhere (models/shelgon3/Shelgon.py:41-45, analyses/*); these tests prove
bundles exported here load into the equivalent torch modules with the exact
key layout and matching numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers

from kindergarten_vq_vae_tpu.ckpt.export_torch import (
    export_reference_bundle,
    save_reference_bundle,
)
from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
from kindergarten_vq_vae_tpu.train.variants import build_model, init_params


def _tiny_cfg(model_name: str) -> RunConfig:
    return RunConfig(
        model=ModelConfig(
            model_name=model_name,
            vocab_size=128,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            compute_dtype="float32",
            emb_size=32,
            word_embedding_size=32,
            vq_e_dim=32,
            enc_out_size=32,
            vq_n_e=5,
        ),
        data=DataConfig(batch_size=16, tokenized_sentence_max_length=12),
        optim=OptimConfig(lr=1e-3),
    )


def _bundle(model_name: str, **model_overrides):
    cfg = _tiny_cfg(model_name)
    for k, v in model_overrides.items():
        setattr(cfg.model, k, v)
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(3))
    return cfg, model, params, export_reference_bundle(cfg, model, params)


_BENIGN_MISSING = {"bert.embeddings.position_ids", "embeddings.position_ids"}


def test_bagon_bundle_loads_into_hf_and_matches_forward(tmp_path):
    cfg, model, params, bundle = _bundle("bagon")

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=512,
    )
    enc = transformers.BertModel(hf_cfg)
    missing, unexpected = enc.load_state_dict(
        {k: torch.as_tensor(np.ascontiguousarray(v))
         for k, v in bundle["encoder_state_dict"].items()}, strict=False,
    )
    assert not unexpected, unexpected
    assert set(missing) <= _BENIGN_MISSING, missing

    dec_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=512,
        is_decoder=True, add_cross_attention=True,
    )
    dec = transformers.BertLMHeadModel(dec_cfg)
    missing, unexpected = dec.load_state_dict(
        {k: torch.as_tensor(np.ascontiguousarray(v))
         for k, v in bundle["decoder_state_dict"].items()}, strict=False,
    )
    assert not unexpected, unexpected
    assert set(missing) <= _BENIGN_MISSING, missing

    # forward parity: exported encoder == our encoder
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 12)).astype(np.int64)
    mask = np.ones_like(ids)
    enc.eval()
    with torch.no_grad():
        ref = enc(torch.as_tensor(ids), attention_mask=torch.as_tensor(mask))
    from kindergarten_vq_vae_tpu.nn.bert import BertModel

    ours = BertModel(model.enc_cfg).apply(
        {"params": params["encoder"]}, jnp.asarray(ids.astype(np.int32)),
        attention_mask=jnp.asarray(mask.astype(np.int32)), deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]), ref.last_hidden_state.numpy(),
        rtol=3e-4, atol=3e-5,
    )

    # torch.save round-trip (the reference consumes torch.load of this file)
    out = tmp_path / "bundle.pth"
    save_reference_bundle(bundle, str(out))
    back = torch.load(str(out))
    assert set(back) == {"model_state_dict", "encoder_state_dict", "decoder_state_dict"}
    assert set(back["model_state_dict"]) == set(bundle["model_state_dict"])


def test_shelgon_extras_match_torch_sequential():
    """proj_in/proj_out export to Sequential(Linear, Conv1d) /
    Sequential(Conv1d, Linear) key layout (models/shelgon/Shelgon.py:40-48),
    and the exported torch modules compute the same bottleneck mapping."""
    cfg, model, params, bundle = _bundle("shelgon")
    sd = bundle["model_state_dict"]
    for key in ("proj_in.0.weight", "proj_in.1.weight", "proj_out.0.weight", "proj_out.1.weight"):
        assert key in sd, key
    assert sd["proj_in.1.weight"].ndim == 3 and sd["proj_in.1.weight"].shape[-1] == 1

    emb, labels = cfg.model.emb_size, 3
    classes, seq = 5, cfg.data.tokenized_sentence_max_length
    proj_in = torch.nn.Sequential(
        torch.nn.Linear(emb, labels), torch.nn.Conv1d(seq, classes, kernel_size=1)
    )
    proj_in[0].weight.data = torch.as_tensor(np.ascontiguousarray(sd["proj_in.0.weight"]))
    proj_in[0].bias.data = torch.as_tensor(sd["proj_in.0.bias"])
    proj_in[1].weight.data = torch.as_tensor(np.ascontiguousarray(sd["proj_in.1.weight"]))
    proj_in[1].bias.data = torch.as_tensor(sd["proj_in.1.bias"])

    rng = np.random.default_rng(1)
    h = rng.normal(size=(2, seq, emb)).astype(np.float32)
    with torch.no_grad():
        ref_logits = proj_in(torch.as_tensor(h)).numpy()  # (B, C, L)

    p = params
    x = jnp.asarray(h) @ p["proj_in_dense"]["kernel"] + p["proj_in_dense"]["bias"]
    ours = jnp.einsum("bsl,cs->bcl", x, p["proj_in_conv_kernel"]) + p["proj_in_conv_bias"][None, :, None]
    np.testing.assert_allclose(np.asarray(ours), ref_logits, rtol=1e-5, atol=1e-6)


def test_shelgon2_extras_keys_and_rename():
    cfg, model, params, bundle = _bundle("shelgon2")
    sd = bundle["model_state_dict"]
    # the reference's 8 discretizers (SentenceDiscretizer.py:25-62), with our
    # 'negation' exported under the reference's 'sentence_neg' name
    for ref_factor in ("gram_num_obj", "sentence_type", "gender", "gram_num_subject",
                       "gram_num_person", "sentence_neg", "tense", "style"):
        assert f"sentence_discretizer.{ref_factor}_discretizer.proj_in.weight" in sd, ref_factor
        assert f"sentence_discretizer.{ref_factor}_discretizer.proj_out.bias" in sd, ref_factor
    assert not any(".negation_discretizer." in k for k in sd)
    assert "sentence_discretizer.latent_factors_contract.weight" in sd
    assert sd["sentence_discretizer.latent_factors_contract.weight"].shape[-1] == 1


def test_shelgon3_vq_and_gumbel_extras():
    cfg, model, params, bundle = _bundle("shelgon3")
    sd = bundle["model_state_dict"]
    assert sd["vector_quantizer.embedding.weight"].shape == (5, 32)
    np.testing.assert_array_equal(
        sd["vector_quantizer.embedding.weight"],
        np.asarray(params["vector_quantizer"]["codebook"]),
    )

    cfg_g = _tiny_cfg("shelgon3")
    cfg_g.model.vq_mode = "GumbelQuantizer"
    model_g = build_model(cfg_g, "test")
    params_g = init_params(cfg_g, jax.random.key(4))
    bundle_g = export_reference_bundle(cfg_g, model_g, params_g)
    sd_g = bundle_g["model_state_dict"]
    assert "vector_quantizer.proj.weight" in sd_g
    assert sd_g["vector_quantizer.proj.weight"].shape[-1] == 1
    assert "vector_quantizer.embed.weight" in sd_g


def test_gpt2_decoder_rejected():
    cfg = _tiny_cfg("bagon")
    cfg.model.decoder_model_name = "gpt2"
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(5))
    with pytest.raises(ValueError, match="GPT-2|no GPT"):
        export_reference_bundle(cfg, model, params)
