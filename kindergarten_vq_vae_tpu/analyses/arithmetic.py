"""Latent arithmetic: factor-direction vectors added at three injection points.

Reference (analyses/latent_arithmetics/):
- ``latent_arithmetics_Shelgon_latent_conditioning.py``: Δ between
  factor-opposite groups in the post-proj_out conditioning space (:144,180).
- ``latent_arithmetics_Shelgon_latent_sentence.py``: Δ in the raw encoder
  output space, before proj_in (:136,168,186-193).
- ``latent_arithmetics_Bagon.py``: Δ directly on Bagon encoder outputs
  (:96,119).

All three reduce to: encode two groups, Δ = mean(A) − mean(B), add Δ to
held-out latents, decode — pure batched jit programs here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kindergarten_vq_vae_tpu.nn.bert import BertLMHeadModel, BertModel
from kindergarten_vq_vae_tpu.ops.gumbel import gumbel_softmax


def _decode_ids(tokenizer, ids):
    return tokenizer.batch_decode(np.asarray(ids)) if tokenizer is not None else None


def _shelgon_conditioning(model, params, input_ids, attention_mask):
    ids, mask = input_ids, attention_mask
    out = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(ids), jnp.asarray(mask),
        deterministic=True, rngs={"gumbel": jax.random.key(0)},
    )
    return out["conditioning"], out["encoder_last_hidden_state"]


def _decoder_apply(dec_cfg, dec_params, ids, mask, hidden):
    out = BertLMHeadModel(dec_cfg).apply(
        {"params": dec_params}, jnp.asarray(ids), jnp.asarray(mask),
        encoder_hidden_states=hidden, deterministic=True,
    )
    return jnp.argmax(out["logits"], axis=-1)


def latent_arithmetic_shelgon_conditioning(
    model, params, group_a, group_b, targets, tokenizer=None
):
    """Δ in the conditioning (post-proj_out) space. group_a/group_b/targets
    are dicts with input_ids + attention_mask."""
    cond_a, _ = _shelgon_conditioning(model, params, **group_a)
    cond_b, _ = _shelgon_conditioning(model, params, **group_b)
    delta = jnp.mean(cond_a, axis=0) - jnp.mean(cond_b, axis=0)

    cond_t, _ = _shelgon_conditioning(model, params, **targets)
    recon = _decoder_apply(
        model.dec_cfg, params["decoder"], targets["input_ids"], targets["attention_mask"], cond_t + delta
    )
    base = _decoder_apply(
        model.dec_cfg, params["decoder"], targets["input_ids"], targets["attention_mask"], cond_t
    )
    return {
        "delta": np.asarray(delta),
        "base_recon_ids": np.asarray(base),
        "shifted_recon_ids": np.asarray(recon),
        "base_recon": _decode_ids(tokenizer, base),
        "shifted_recon": _decode_ids(tokenizer, recon),
    }


def _shelgon_bottleneck(model, params, h):
    """proj_in -> gumbel -> proj_out on raw encoder states (the model's own
    bottleneck math, applied to externally modified latents)."""
    p = params
    x = h @ p["proj_in_dense"]["kernel"] + p["proj_in_dense"]["bias"]
    logits = jnp.einsum("bsl,cs->bcl", x, p["proj_in_conv_kernel"]) + p["proj_in_conv_bias"][None, :, None]
    classes = gumbel_softmax(jax.random.key(0), logits, tau=1.0, hard=False, axis=-1)
    y = jnp.einsum("bcl,sc->bsl", classes, p["proj_out_conv_kernel"]) + p["proj_out_conv_bias"][None, :, None]
    return y @ p["proj_out_dense"]["kernel"] + p["proj_out_dense"]["bias"]


def latent_arithmetic_shelgon_sentence(model, params, group_a, group_b, targets, tokenizer=None):
    """Δ in the raw encoder-output space, pushed through the bottleneck."""
    _, h_a = _shelgon_conditioning(model, params, **group_a)
    _, h_b = _shelgon_conditioning(model, params, **group_b)
    delta = jnp.mean(h_a, axis=0) - jnp.mean(h_b, axis=0)

    _, h_t = _shelgon_conditioning(model, params, **targets)
    cond_shift = _shelgon_bottleneck(model, params, h_t + delta)
    cond_base = _shelgon_bottleneck(model, params, h_t)
    shifted = _decoder_apply(model.dec_cfg, params["decoder"], targets["input_ids"], targets["attention_mask"], cond_shift)
    base = _decoder_apply(model.dec_cfg, params["decoder"], targets["input_ids"], targets["attention_mask"], cond_base)
    return {
        "delta": np.asarray(delta),
        "base_recon_ids": np.asarray(base),
        "shifted_recon_ids": np.asarray(shifted),
        "base_recon": _decode_ids(tokenizer, base),
        "shifted_recon": _decode_ids(tokenizer, shifted),
    }


def latent_arithmetic_bagon(model, params, group_a, group_b, targets, tokenizer=None):
    """Δ directly in Bagon encoder space (latent_arithmetics_Bagon.py:96,119)."""
    def encode(d):
        out = BertModel(model.enc_cfg).apply(
            {"params": params["encoder"]}, jnp.asarray(d["input_ids"]),
            attention_mask=jnp.asarray(d["attention_mask"]), deterministic=True,
        )
        return out["last_hidden_state"]

    h_a, h_b, h_t = encode(group_a), encode(group_b), encode(targets)
    delta = jnp.mean(h_a, axis=0) - jnp.mean(h_b, axis=0)
    shifted = _decoder_apply(model.dec_cfg, params["decoder"], targets["input_ids"], targets["attention_mask"], h_t + delta)
    base = _decoder_apply(model.dec_cfg, params["decoder"], targets["input_ids"], targets["attention_mask"], h_t)
    return {
        "delta": np.asarray(delta),
        "base_recon_ids": np.asarray(base),
        "shifted_recon_ids": np.asarray(shifted),
        "base_recon": _decode_ids(tokenizer, base),
        "shifted_recon": _decode_ids(tokenizer, shifted),
    }
