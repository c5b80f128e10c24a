"""From-scratch Flax BERT encoder + BERT-LM-head decoder with cross-attention.

TPU-first re-design of the reference's HF usage
(models/bagon/Bagon.py:25-55: ``EncoderDecoderModel.from_encoder_decoder_pretrained``
= BertModel encoder + BertLMHeadModel decoder with
``is_decoder=True, add_cross_attention=True``). Not a port of HF code — a
clean Flax implementation engineered for XLA/MXU:

- fused QKV projection (one (H, 3H) matmul instead of three (H, H)) and
  fused KV for cross-attention;
- configurable compute dtype (bf16 on the MXU, f32 params/accumulation);
- everything shape-static; attention over 12-14 token sequences stays
  entirely in registers/VMEM after XLA fusion;
- optional attention-probability outputs for the cross-attention analyses
  (ref analyses/cross_attention/extract_model_cross_attention.py:79-83).

Semantics verified against HF ``transformers`` BERT by golden forward-logit
tests (tests/test_bert_parity.py) using randomly initialized HF models —
exact architecture parity: post-LN transformer, erf-GELU, learned position
embeddings, causal self-attention in decoder mode, tied MLM head decoder.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

NEG_INF = -1e9  # finite mask value (all-masked rows stay NaN-free, like HF's finfo.min)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    initializer_range: float = 0.02
    pad_token_id: int = 0
    is_decoder: bool = False
    add_cross_attention: bool = False
    add_pooler: bool = True
    tie_word_embeddings: bool = True
    gelu_exact: bool = True  # erf GELU (HF parity); False = tanh approx (faster)
    remat: bool = False  # jax.checkpoint each layer: trade FLOPs for HBM
    # fused block-diagonal SDPA Pallas kernel (ops/sdpa_pallas.py) for self-
    # and cross-attention, fwd AND bwd — the tiny-seq layout fix. Falls back
    # to the einsum path when attention probabilities are requested.
    fused_sdpa: bool = False
    sdpa_block_b: int = 64  # sentences per kernel tile
    dtype: Any = jnp.float32  # compute dtype; params are always f32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def bert_base_config(**overrides) -> BertConfig:
    """bert-base-uncased geometry (the reference's fixed choice,
    models/bagon/main.py:56-60)."""
    return BertConfig(**overrides)


def _dense_init(cfg: BertConfig):
    return nn.initializers.normal(cfg.initializer_range)


class BertEmbeddings(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic: bool = True):
        cfg = self.cfg
        seq_len = input_ids.shape[1]
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=_dense_init(cfg), name="word_embeddings"
        )(input_ids)
        pos_table = self.param(
            "position_embeddings",
            _dense_init(cfg),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        pos = pos_table[None, :seq_len, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok_type = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, embedding_init=_dense_init(cfg), name="token_type_embeddings"
        )(token_type_ids)
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="layer_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return x.astype(cfg.dtype)


def _split_heads(x, num_heads, head_dim):
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, head_dim)


def _attention_probs(q, k, bias, dtype):
    """Scaled-dot-product attention probabilities. q,k: (B, S, h, d)."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(q.dtype)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)


def _sdpa_seed(module: nn.Module, deterministic: bool, rate: float):
    """Per-layer per-step int32 seed for in-kernel hash dropout (flax folds
    the module path into make_rng, so each layer draws a distinct seed)."""
    if deterministic or rate == 0.0:
        return jnp.zeros((1,), jnp.int32), 0.0
    key = module.make_rng("dropout")
    seed = jax.random.randint(
        key, (1,), jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    )
    return seed, rate


class BertSelfAttention(nn.Module):
    """Self-attention with fused QKV; causal when cfg.is_decoder."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool = True, output_attentions: bool = False):
        cfg = self.cfg
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        qkv = nn.Dense(3 * h, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if cfg.fused_sdpa and not output_attentions:
            from kindergarten_vq_vae_tpu.ops.sdpa_pallas import fused_sdpa

            seed, rate = _sdpa_seed(self, deterministic, cfg.attention_dropout)
            ctx = fused_sdpa(
                q, k, v, attention_mask, seed, nh,
                causal=cfg.is_decoder, rate=rate, block_b=cfg.sdpa_block_b,
            )
            probs = None
        else:
            q, k, v = (_split_heads(t, nh, hd) for t in (q, k, v))
            seq_len = x.shape[1]
            bias = jnp.zeros((1, 1, seq_len, seq_len), cfg.dtype)
            if attention_mask is not None:
                bias = bias + (1.0 - attention_mask[:, None, None, :].astype(cfg.dtype)) * NEG_INF
            if cfg.is_decoder:
                causal = jnp.tril(jnp.ones((seq_len, seq_len), bool))
                bias = bias + jnp.where(causal, 0.0, NEG_INF)[None, None, :, :].astype(cfg.dtype)

            probs = _attention_probs(q, k, bias, cfg.dtype)
            dropped = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", dropped, v)
            ctx = ctx.reshape(x.shape[0], x.shape[1], h)
        out = nn.Dense(h, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="out")(ctx)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="layer_norm")(x + out)
        return x.astype(cfg.dtype), probs


class BertCrossAttention(nn.Module):
    """Cross-attention: queries from decoder states, fused KV from encoder states."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, x, kv_states, encoder_attention_mask=None, deterministic: bool = True, output_attentions: bool = False):
        cfg = self.cfg
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        q = nn.Dense(h, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="q")(x)
        kv = nn.Dense(2 * h, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="kv")(kv_states.astype(cfg.dtype))
        k, v = jnp.split(kv, 2, axis=-1)

        if cfg.fused_sdpa and not output_attentions:
            from kindergarten_vq_vae_tpu.ops.sdpa_pallas import fused_sdpa

            seed, rate = _sdpa_seed(self, deterministic, cfg.attention_dropout)
            ctx = fused_sdpa(
                q, k, v, encoder_attention_mask, seed, nh,
                causal=False, rate=rate, block_b=cfg.sdpa_block_b,
            )
            probs = None
        else:
            q, k, v = (_split_heads(t, nh, hd) for t in (q, k, v))

            bias = None
            if encoder_attention_mask is not None:
                # the reference never passes one (Bagon.py:50-53) — cross-attn
                # attends to every encoder position by default; kept optional.
                bias = (1.0 - encoder_attention_mask[:, None, None, :].astype(cfg.dtype)) * NEG_INF

            probs = _attention_probs(q, k, bias, cfg.dtype)
            dropped = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", dropped, v)
            ctx = ctx.reshape(x.shape[0], x.shape[1], h)
        out = nn.Dense(h, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="out")(ctx)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="layer_norm")(x + out)
        return x.astype(cfg.dtype), probs


class BertMlp(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        y = nn.Dense(cfg.intermediate_size, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="intermediate")(x)
        # gelu upcasts to f32 internally; cast back so the saved residual (and
        # therefore fc2's backward matmuls) stay in the bf16 MXU path
        y = nn.gelu(y, approximate=not cfg.gelu_exact).astype(cfg.dtype)
        y = nn.Dense(cfg.hidden_size, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="output")(y)
        y = nn.Dropout(cfg.hidden_dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="layer_norm")(x + y)
        return x.astype(cfg.dtype)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        x,
        attention_mask,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        deterministic: bool = True,
        output_attentions: bool = False,
    ):
        cfg = self.cfg
        x, self_probs = BertSelfAttention(cfg, name="self_attn")(
            x, attention_mask, deterministic, output_attentions
        )
        cross_probs = None
        if cfg.add_cross_attention and encoder_hidden_states is not None:
            x, cross_probs = BertCrossAttention(cfg, name="cross_attn")(
                x, encoder_hidden_states, encoder_attention_mask, deterministic, output_attentions
            )
        x = BertMlp(cfg, name="mlp")(x, deterministic)
        return x, self_probs, cross_probs


class BertModel(nn.Module):
    """BERT trunk. Encoder mode: (last_hidden_state, pooler_output).
    Decoder mode (is_decoder + add_cross_attention): causal self-attention and
    per-layer cross-attention over ``encoder_hidden_states``."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        deterministic: bool = True,
        output_attentions: bool = False,
    ):
        cfg = self.cfg
        x = BertEmbeddings(cfg, name="embeddings")(input_ids, token_type_ids, deterministic)
        self_attns, cross_attns = [], []
        layer_cls = BertLayer
        if cfg.remat and not output_attentions:
            # rematerialize activations in backward (HBM-for-FLOPs trade)
            layer_cls = nn.remat(BertLayer, static_argnums=(5, 6))
        for i in range(cfg.num_layers):
            x, sp, cp = layer_cls(cfg, name=f"layer_{i}")(
                x, attention_mask, encoder_hidden_states, encoder_attention_mask,
                deterministic, output_attentions,
            )
            if output_attentions:
                self_attns.append(sp)
                cross_attns.append(cp)

        pooled = None
        if cfg.add_pooler:
            pooled = nn.Dense(cfg.hidden_size, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="pooler")(x[:, 0])
            pooled = jnp.tanh(pooled)

        out = {"last_hidden_state": x, "pooler_output": pooled}
        if output_attentions:
            out["attentions"] = tuple(self_attns)
            out["cross_attentions"] = tuple(cross_attns)
        return out


class BertMLMHead(nn.Module):
    """HF ``cls.predictions``: transform dense + gelu + LN, then vocab
    projection (kernel tied to the word-embedding table when configured)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, x, word_embedding_table=None):
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_size, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="transform_dense")(x)
        x = nn.gelu(x, approximate=not cfg.gelu_exact).astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="transform_layer_norm")(x)
        if cfg.tie_word_embeddings:
            assert word_embedding_table is not None
            kernel = word_embedding_table.T.astype(cfg.dtype)
        else:
            kernel = self.param(
                "decoder_kernel", _dense_init(cfg), (cfg.hidden_size, cfg.vocab_size)
            ).astype(cfg.dtype)
        bias = self.param("decoder_bias", nn.initializers.zeros, (cfg.vocab_size,))
        logits = x @ kernel + bias.astype(cfg.dtype)
        return logits


class BertLMHeadModel(nn.Module):
    """BertModel (no pooler) + MLM head — the decoder of the enc-dec pair
    (ref Bagon.py:31 ``enc_dec.decoder``)."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        deterministic: bool = True,
        output_attentions: bool = False,
    ):
        cfg = dataclasses.replace(self.cfg, add_pooler=False)
        bert = BertModel(cfg, name="bert")
        out = bert(
            input_ids,
            attention_mask=attention_mask,
            encoder_hidden_states=encoder_hidden_states,
            encoder_attention_mask=encoder_attention_mask,
            deterministic=deterministic,
            output_attentions=output_attentions,
        )
        word_table = None
        if cfg.tie_word_embeddings:
            word_table = bert.variables["params"]["embeddings"]["word_embeddings"]["embedding"]
        logits = BertMLMHead(cfg, name="mlm_head")(out["last_hidden_state"], word_table)
        out["logits"] = logits
        return out
