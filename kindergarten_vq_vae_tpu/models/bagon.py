"""Bagon: BERT encoder + BERT-LM-head decoder autoencoder, no bottleneck.

Reference: models/bagon/Bagon.py:15-55. forward(enc_ids, enc_mask, dec_ids,
dec_mask) = encoder last_hidden_state -> decoder cross-attention -> logits.
The freezing API (``set_mode``) is functionalized as optimizer masks in
train/freezing.py instead of mutating requires_grad flags.
"""

from __future__ import annotations

from flax import linen as nn

from kindergarten_vq_vae_tpu.nn.bert import BertConfig, BertLMHeadModel, BertModel
from kindergarten_vq_vae_tpu.nn.gpt2 import GPT2Config, GPT2LMHeadModel

# decoder-output keys forwarded by every model wrapper: the plain logits, or
# the fused-head triple consumed by ops/head_ce_pallas.fused_head_ce_loss
HEAD_KEYS = ("logits", "mlm_hidden", "head_table", "head_bias")


class Bagon(nn.Module):
    enc_cfg: BertConfig
    dec_cfg: object  # BertConfig or GPT2Config

    @nn.compact
    def __call__(
        self,
        encoder_input_ids,
        encoder_attention_mask,
        decoder_input_ids,
        decoder_attention_mask,
        deterministic: bool = True,
        output_attentions: bool = False,
    ):
        enc_out = BertModel(self.enc_cfg, name="encoder")(
            encoder_input_ids,
            attention_mask=encoder_attention_mask,
            deterministic=deterministic,
        )
        dec_out = (GPT2LMHeadModel if isinstance(self.dec_cfg, GPT2Config) else BertLMHeadModel)(self.dec_cfg, name="decoder")(
            decoder_input_ids,
            attention_mask=decoder_attention_mask,
            encoder_hidden_states=enc_out["last_hidden_state"],
            deterministic=deterministic,
            output_attentions=output_attentions,
        )
        out = {
            # logits, or (mlm_hidden, head_table, head_bias) under fused_head
            **{k: dec_out[k] for k in HEAD_KEYS if k in dec_out},
            "encoder_last_hidden_state": enc_out["last_hidden_state"],
            "encoder_pooler_output": enc_out["pooler_output"],
        }
        if output_attentions:
            out["decoder_attentions"] = dec_out["attentions"]
            out["decoder_cross_attentions"] = dec_out["cross_attentions"]
        return out
