"""Shelgon2: per-generative-factor discretizers on the pooled sentence embedding.

Reference: models/shelgon2/{Shelgon2,SentenceDiscretizer,GenerativeFactorDiscretizer}.py.
- encoder ``pooler_output`` (sentence-level) feeds 8 named factor
  discretizers (SentenceDiscretizer.py:25-61), each:
  Linear(emb->3) -> gumbel_softmax (or caller override) -> stop-grad argmax
  label -> Linear(3->emb)  (GenerativeFactorDiscretizer.py:23-37).
- the 8 reconstructed embeddings stack to (B, 8, E) then a k=1 Conv1d maps
  factors -> sentence positions (SentenceDiscretizer.py:63-66,86-101):
  einsum('bfe,sf->bse') + bias[s].
- the decoder cross-attends to the discretized sentence; its input ids are
  corrupted by ``mask_pct`` (Shelgon2.py:61-66 — the reference's call is
  broken, SURVEY §2.9.5; here it is implemented working, with the pct taken
  from config and threaded PRNG).
Returns (recon_logits, gen_factors_logits (B, 3, 8), gen_factors_labels (B, 8)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from kindergarten_vq_vae_tpu.nn.bert import BertConfig, BertLMHeadModel, BertModel
from kindergarten_vq_vae_tpu.nn.gpt2 import GPT2Config, GPT2LMHeadModel
from kindergarten_vq_vae_tpu.ops.gumbel import gumbel_softmax
from kindergarten_vq_vae_tpu.utils.tensor import replace_pct_rand_values

FACTOR_NAMES = (
    "gram_num_obj",
    "sentence_type",
    "gender",
    "gram_num_subject",
    "gram_num_person",
    "negation",
    "tense",
    "style",
)


class GenerativeFactorDiscretizer(nn.Module):
    word_emb_size: int
    gen_factor_num_values: int = 3

    @nn.compact
    def __call__(self, embedded_sentences, override_logits=None, deterministic: bool = True):
        init = nn.initializers.normal(0.02)
        logits = nn.Dense(self.gen_factor_num_values, kernel_init=init, name="proj_in")(embedded_sentences)
        if override_logits is None:
            key = self.make_rng("gumbel")
            soft = gumbel_softmax(key, logits, tau=1.0, hard=False, axis=-1)
        else:
            soft = override_logits
        label = jax.lax.stop_gradient(jnp.argmax(soft, axis=-1))
        recon = nn.Dense(self.word_emb_size, kernel_init=init, name="proj_out")(soft)
        return recon, soft, label


class SentenceDiscretizer(nn.Module):
    word_emb_size: int
    sentence_len: int
    num_latent_gen_factors: int = 8

    @nn.compact
    def __call__(self, embedded_sentences, overrides=None, deterministic: bool = True):
        overrides = overrides or {}
        embs, logits_list, labels_list = [], [], []
        for name in FACTOR_NAMES[: self.num_latent_gen_factors]:
            emb, logit, label = GenerativeFactorDiscretizer(
                self.word_emb_size, name=f"{name}_discretizer"
            )(embedded_sentences, overrides.get(name), deterministic)
            embs.append(emb)
            logits_list.append(logit)
            labels_list.append(label)

        stacked = jnp.stack(embs, axis=1)  # (B, F, E)
        init = nn.initializers.normal(0.02)
        w = self.param("contract_kernel", init, (self.sentence_len, self.num_latent_gen_factors))
        b = self.param("contract_bias", nn.initializers.zeros, (self.sentence_len,))
        discretized = jnp.einsum("bfe,sf->bse", stacked, w) + b[None, :, None]  # (B, S, E)

        gen_factors_logits = jnp.stack(logits_list, axis=-1)  # (B, 3, F) ref dim order
        gen_factors_labels = jnp.stack(labels_list, axis=-1)  # (B, F)
        return discretized, gen_factors_logits, gen_factors_labels


class Shelgon2(nn.Module):
    enc_cfg: BertConfig
    dec_cfg: object  # BertConfig or GPT2Config
    word_emb_size: int = 768
    sentence_len: int = 14
    num_latent_gen_factors: int = 8
    mask_pct: float = 0.0

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        deterministic: bool = True,
        overrides=None,
        output_attentions: bool = False,
    ):
        enc_out = BertModel(self.enc_cfg, name="encoder")(
            input_ids, attention_mask=attention_mask, deterministic=deterministic
        )
        embedded_sentences = enc_out["pooler_output"]  # (B, E) sentence-level

        discretized, gen_logits, gen_labels = SentenceDiscretizer(
            self.word_emb_size,
            self.sentence_len,
            self.num_latent_gen_factors,
            name="sentence_discretizer",
        )(embedded_sentences, overrides, deterministic)

        decoder_input_ids = input_ids
        if self.mask_pct > 0.0 and not deterministic:
            key = self.make_rng("perturb")
            decoder_input_ids = replace_pct_rand_values(
                key, input_ids, self.mask_pct, 0, self.dec_cfg.vocab_size
            )

        dec_out = (GPT2LMHeadModel if isinstance(self.dec_cfg, GPT2Config) else BertLMHeadModel)(self.dec_cfg, name="decoder")(
            decoder_input_ids,
            attention_mask=attention_mask,
            encoder_hidden_states=discretized,
            deterministic=deterministic,
            output_attentions=output_attentions,
        )
        from kindergarten_vq_vae_tpu.models.bagon import HEAD_KEYS

        out = {
            **{k: dec_out[k] for k in HEAD_KEYS if k in dec_out},
            "gen_factors_logits": gen_logits,
            "gen_factors_labels": gen_labels,
            "discretized_sentence": discretized,
            "encoder_pooler_output": embedded_sentences,
        }
        if output_attentions:
            out["decoder_attentions"] = dec_out["attentions"]
            out["decoder_cross_attentions"] = dec_out["cross_attentions"]
        return out
