"""Shelgon: Bagon + Gumbel-softmax latent-class bottleneck (supervised).

Reference: models/shelgon/Shelgon.py:17-71.
- proj_in  = Linear(emb->labels_per_class) then Conv1d(seq_len->num_classes, k=1)
  (Shelgon.py:40-43). A k=1 Conv1d over the sequence-as-channels axis is a
  dense along the sequence axis: einsum('bsl,cs->bcl') + bias[c].
- gumbel_softmax over the label axis (Shelgon.py:62; torch defaults tau=1,
  hard=False).
- proj_out mirrors proj_in (Shelgon.py:45-48); the decoder cross-attends to
  the reconstructed conditioning (Shelgon.py:64-69).
Returns (recon_logits, pred_latent_logits, pred_latent_classes) (:71).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from kindergarten_vq_vae_tpu.nn.bert import BertConfig, BertLMHeadModel, BertModel
from kindergarten_vq_vae_tpu.nn.gpt2 import GPT2Config, GPT2LMHeadModel
from kindergarten_vq_vae_tpu.ops.gumbel import gumbel_softmax


class Shelgon(nn.Module):
    enc_cfg: BertConfig
    dec_cfg: object  # BertConfig or GPT2Config
    emb_size: int = 768
    seq_len: int = 14
    num_latent_classes: int = 5
    num_labels_per_class: int = 3
    gumbel_tau: float = 1.0

    @nn.compact
    def __call__(
        self,
        encoder_input_ids,
        encoder_attention_mask,
        decoder_input_ids,
        decoder_attention_mask,
        deterministic: bool = True,
        override_latent_classes=None,
        output_attentions: bool = False,
    ):
        init = nn.initializers.normal(0.02)
        enc_out = BertModel(self.enc_cfg, name="encoder")(
            encoder_input_ids,
            attention_mask=encoder_attention_mask,
            deterministic=deterministic,
        )
        h = enc_out["last_hidden_state"]  # (B, S, E)

        # proj_in
        x = nn.Dense(self.num_labels_per_class, kernel_init=init, name="proj_in_dense")(h)  # (B, S, L)
        w_in = self.param("proj_in_conv_kernel", init, (self.num_latent_classes, self.seq_len))
        b_in = self.param("proj_in_conv_bias", nn.initializers.zeros, (self.num_latent_classes,))
        pred_latent_logits = jnp.einsum("bsl,cs->bcl", x, w_in) + b_in[None, :, None]  # (B, C, L)

        if override_latent_classes is None:
            key = self.make_rng("gumbel")
            pred_latent_classes = gumbel_softmax(key, pred_latent_logits, tau=self.gumbel_tau, hard=False, axis=-1)
        else:
            # latent-traversal / arithmetic hook (ref
            # analyses/latent_traversals/...py:130-138 swaps the one-hot)
            pred_latent_classes = override_latent_classes

        # proj_out
        w_out = self.param("proj_out_conv_kernel", init, (self.seq_len, self.num_latent_classes))
        b_out = self.param("proj_out_conv_bias", nn.initializers.zeros, (self.seq_len,))
        y = jnp.einsum("bcl,sc->bsl", pred_latent_classes, w_out) + b_out[None, :, None]  # (B, S, L)
        conditioning = nn.Dense(self.emb_size, kernel_init=init, name="proj_out_dense")(y)  # (B, S, E)

        dec_out = (GPT2LMHeadModel if isinstance(self.dec_cfg, GPT2Config) else BertLMHeadModel)(self.dec_cfg, name="decoder")(
            decoder_input_ids,
            attention_mask=decoder_attention_mask,
            encoder_hidden_states=conditioning,
            deterministic=deterministic,
            output_attentions=output_attentions,
        )
        from kindergarten_vq_vae_tpu.models.bagon import HEAD_KEYS

        out = {
            **{k: dec_out[k] for k in HEAD_KEYS if k in dec_out},
            "pred_latent_logits": pred_latent_logits,
            "pred_latent_classes": pred_latent_classes,
            "conditioning": conditioning,
            "encoder_last_hidden_state": h,
        }
        if output_attentions:
            out["decoder_attentions"] = dec_out["attentions"]
            out["decoder_cross_attentions"] = dec_out["cross_attentions"]
        return out
