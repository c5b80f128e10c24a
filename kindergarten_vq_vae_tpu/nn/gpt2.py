"""From-scratch Flax GPT-2 LM with cross-attention (decoder option).

The reference's Bagon supports a GPT-2 decoder in the enc-dec pair
(models/bagon/Bagon.py:109-124 GPT-2 LM-head/cross-attn freezing selectors;
models/bagon/main.py:69-73 GPT-2 tokenizer with pad=eos). This is the HF
``GPT2LMHeadModel(add_cross_attention=True)`` architecture rebuilt in Flax:

- pre-LN blocks: ln_1 -> causal self-attn -> +res;
  [ln_cross_attn -> cross-attn over encoder states -> +res];
  ln_2 -> MLP (gelu_new / tanh-approx) -> +res; final ln_f
- fused c_attn (H -> 3H) exactly like HF's Conv1D (which stores (in, out),
  so the converter needs NO transposes)
- LM head tied to wte, no bias

Golden-parity-tested vs randomly initialized HF torch GPT-2
(tests/test_gpt2_parity.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    initializer_range: float = 0.02
    add_cross_attention: bool = True
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def intermediate_size(self) -> int:
        return 4 * self.hidden_size


def _init(cfg):
    return nn.initializers.normal(cfg.initializer_range)


def _split_heads(x, nh, hd):
    b, s, _ = x.shape
    return x.reshape(b, s, nh, hd)


def _attn(q, k, v, bias, dtype):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    return probs


class GPT2Block(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, x, attention_mask, encoder_hidden_states=None,
                 encoder_attention_mask=None, deterministic: bool = True):
        cfg = self.cfg
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        seq = x.shape[1]

        # --- causal self-attention
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * h, kernel_init=_init(cfg), dtype=cfg.dtype, name="c_attn")(y)
        q, k, v = (_split_heads(t, nh, hd) for t in jnp.split(qkv, 3, axis=-1))
        causal = jnp.tril(jnp.ones((seq, seq), bool))
        bias = jnp.where(causal, 0.0, NEG_INF)[None, None, :, :].astype(cfg.dtype)
        if attention_mask is not None:
            bias = bias + (1.0 - attention_mask[:, None, None, :].astype(cfg.dtype)) * NEG_INF
        probs = _attn(q, k, v, bias, cfg.dtype)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(x.shape[0], seq, h)
        ctx = nn.Dense(h, kernel_init=_init(cfg), dtype=cfg.dtype, name="c_proj")(ctx)
        ctx = nn.Dropout(cfg.hidden_dropout)(ctx, deterministic=deterministic)
        x = x + ctx
        cross_probs = None

        # --- cross-attention (HF GPT2Attention is_cross_attention path)
        if cfg.add_cross_attention and encoder_hidden_states is not None:
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln_cross_attn")(x)
            q = nn.Dense(h, kernel_init=_init(cfg), dtype=cfg.dtype, name="q_attn")(y)
            kv = nn.Dense(2 * h, kernel_init=_init(cfg), dtype=cfg.dtype, name="crossattention_c_attn")(
                encoder_hidden_states.astype(cfg.dtype)
            )
            k, v = (_split_heads(t, nh, hd) for t in jnp.split(kv, 2, axis=-1))
            q = _split_heads(q, nh, hd)
            cbias = None
            if encoder_attention_mask is not None:
                cbias = (1.0 - encoder_attention_mask[:, None, None, :].astype(cfg.dtype)) * NEG_INF
            cross_probs = _attn(q, k, v, cbias, cfg.dtype)
            dropped = nn.Dropout(cfg.attention_dropout)(cross_probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", dropped, v).reshape(x.shape[0], seq, h)
            ctx = nn.Dense(h, kernel_init=_init(cfg), dtype=cfg.dtype, name="crossattention_c_proj")(ctx)
            ctx = nn.Dropout(cfg.hidden_dropout)(ctx, deterministic=deterministic)
            x = x + ctx

        # --- MLP
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln_2")(x)
        y = nn.Dense(cfg.intermediate_size, kernel_init=_init(cfg), dtype=cfg.dtype, name="c_fc")(y)
        y = nn.gelu(y, approximate=True).astype(cfg.dtype)  # HF gelu_new; keep bf16 residuals
        y = nn.Dense(h, kernel_init=_init(cfg), dtype=cfg.dtype, name="mlp_c_proj")(y)
        y = nn.Dropout(cfg.hidden_dropout)(y, deterministic=deterministic)
        x = x + y
        return x.astype(cfg.dtype), cross_probs


class GPT2LMHeadModel(nn.Module):
    """GPT-2 LM with optional cross-attention — decoder drop-in for the
    enc-dec pair (same call signature as nn.bert.BertLMHeadModel)."""

    cfg: GPT2Config

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, encoder_hidden_states=None,
                 encoder_attention_mask=None, deterministic: bool = True,
                 output_attentions: bool = False):
        cfg = self.cfg
        seq = input_ids.shape[1]
        wte = nn.Embed(cfg.vocab_size, cfg.hidden_size, embedding_init=_init(cfg), name="wte")
        wpe = self.param("wpe", _init(cfg), (cfg.max_position_embeddings, cfg.hidden_size))
        x = wte(input_ids) + wpe[None, :seq, :]
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        x = x.astype(cfg.dtype)

        cross_attns = []
        for i in range(cfg.num_layers):
            x, cp = GPT2Block(cfg, name=f"layer_{i}")(
                x, attention_mask, encoder_hidden_states, encoder_attention_mask, deterministic
            )
            if output_attentions:
                cross_attns.append(cp)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln_f")(x)

        if cfg.tie_word_embeddings:
            kernel = wte.embedding.T.astype(cfg.dtype)
        else:
            kernel = self.param("lm_head_kernel", _init(cfg), (cfg.hidden_size, cfg.vocab_size)).astype(cfg.dtype)
        logits = x @ kernel  # HF lm_head has no bias

        out = {"logits": logits, "last_hidden_state": x}
        if output_attentions:
            out["cross_attentions"] = tuple(cross_attns)
            out["attentions"] = ()
        return out


def convert_gpt2_state_dict(sd, cfg: GPT2Config, fresh_params=None) -> dict:
    """HF torch GPT2LMHeadModel state_dict -> Flax params.

    HF GPT-2 uses Conv1D modules storing weights as (in, out) — identical to
    Flax Dense kernels, so no transposes. Missing cross-attention keys (a
    plain LM checkpoint) keep the fresh init, mirroring
    from_encoder_decoder_pretrained.
    """
    import numpy as np

    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def lin(prefix):
        return {"kernel": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    p: dict = {
        "wte": {"embedding": _np(sd["transformer.wte.weight"])},
        "wpe": _np(sd["transformer.wpe.weight"]),
        "ln_f": ln("transformer.ln_f"),
    }
    for i in range(cfg.num_layers):
        hp = f"transformer.h.{i}"
        layer = {
            "ln_1": ln(f"{hp}.ln_1"),
            "c_attn": lin(f"{hp}.attn.c_attn"),
            "c_proj": lin(f"{hp}.attn.c_proj"),
            "ln_2": ln(f"{hp}.ln_2"),
            "c_fc": lin(f"{hp}.mlp.c_fc"),
            "mlp_c_proj": lin(f"{hp}.mlp.c_proj"),
        }
        if cfg.add_cross_attention:
            if f"{hp}.crossattention.q_attn.weight" in sd:
                layer["ln_cross_attn"] = ln(f"{hp}.ln_cross_attn")
                layer["q_attn"] = lin(f"{hp}.crossattention.q_attn")
                layer["crossattention_c_attn"] = lin(f"{hp}.crossattention.c_attn")
                layer["crossattention_c_proj"] = lin(f"{hp}.crossattention.c_proj")
            else:
                assert fresh_params is not None, "need fresh params for missing cross-attention"
                fresh_layer = fresh_params[f"layer_{i}"]
                for k in ("ln_cross_attn", "q_attn", "crossattention_c_attn", "crossattention_c_proj"):
                    layer[k] = fresh_layer[k]
        p[f"layer_{i}"] = layer
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        p["lm_head_kernel"] = _np(sd["lm_head.weight"]).T
    return p
