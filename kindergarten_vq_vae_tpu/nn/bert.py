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
    # fused whole-layer Pallas kernel (ops/layer_pallas.py): one kernel per
    # BertLayer keeping every intermediate VMEM-resident, recompute-based
    # fused backward. Supersedes fused_sdpa when enabled; falls back to the
    # unfused path when attention probabilities are requested.
    fused_layer: bool = False
    layer_block_b_fwd: int = 64  # sentences per fwd tile
    layer_block_b_bwd: int = 32  # sentences per bwd tile (dW accums in VMEM)
    layer_attn_chunk: int = 8    # sentences per attention sub-chunk (see LayerGeom)
    layer_attn_chunk_fwd: int = 0  # fwd-only chunk override; 0 = layer_attn_chunk
    # Device mesh for the fused trunk: when set, the whole fused-layer stack
    # runs under ONE shard_map over the mesh's dp axes (each device's batch
    # shard through per-shard Pallas kernels; weights replicated in, their
    # cotangents reduced by the shard_map transpose OUTSIDE the custom VJP —
    # the same composition rule as ops/vq_pallas.fused_vector_quantize_sharded).
    # None = single-device pallas_call.
    mesh: Any = None
    # fused MLM-head + CE + argmax (ops/head_ce_pallas.py): the LM-head model
    # returns the transformed hidden states + (tied) table + bias instead of
    # projecting to (B, S, vocab) logits; the loss fn fuses projection, NLL
    # and argmax in one rows x vocab-tiles kernel pass. Requires tied
    # embeddings. Set by train/variants for the loss path only — inference/
    # analyses builders keep it off and get logits as usual.
    fused_head: bool = False
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


class _DenseParams(nn.Module):
    """Declares the same params an nn.Dense would (for the fused-layer path,
    which consumes raw weights but must keep the param tree identical)."""

    fin: int
    fout: int
    cfg: BertConfig

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", _dense_init(self.cfg), (self.fin, self.fout)),
            self.param("bias", nn.initializers.zeros, (self.fout,)),
        )


class _LayerNormParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _SelfAttnParams(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self):
        h = self.cfg.hidden_size
        return (
            *_DenseParams(h, 3 * h, self.cfg, name="qkv")(),
            *_DenseParams(h, h, self.cfg, name="out")(),
            *_LayerNormParams(h, name="layer_norm")(),
        )


class _CrossAttnParams(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self):
        h = self.cfg.hidden_size
        return (
            *_DenseParams(h, h, self.cfg, name="q")(),
            *_DenseParams(h, 2 * h, self.cfg, name="kv")(),
            *_DenseParams(h, h, self.cfg, name="out")(),
            *_LayerNormParams(h, name="layer_norm")(),
        )


class _MlpParams(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self):
        h, f = self.cfg.hidden_size, self.cfg.intermediate_size
        return (
            *_DenseParams(h, f, self.cfg, name="intermediate")(),
            *_DenseParams(f, h, self.cfg, name="output")(),
            *_LayerNormParams(h, name="layer_norm")(),
        )


class _LayerParams(nn.Module):
    """Declares one BertLayer's full param set (identical tree to the unfused
    modules) and returns the flat weight tuple in ops.layer_pallas order."""

    cfg: BertConfig
    use_cross: bool  # include cross-attn weights in the returned tuple

    @nn.compact
    def __call__(self):
        cfg = self.cfg
        sa = _SelfAttnParams(cfg, name="self_attn")()
        cross = ()
        if cfg.add_cross_attention:
            # params must exist whenever the unfused path would create them
            declared = _CrossAttnParams(cfg, name="cross_attn")()
            if self.use_cross:
                cross = declared
        return sa + cross + _MlpParams(cfg, name="mlp")()


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


def _fused_trunk(module: nn.Module, cfg: BertConfig, x, attention_mask,
                 encoder_hidden_states, encoder_attention_mask,
                 deterministic: bool):
    """All transformer layers as an unrolled loop of fused whole-layer
    Pallas kernels (ops/layer_pallas.py), one fwd + one bwd kernel per
    BertLayer. (A rolled lax.scan over stacked weights was measured ~13 ms
    slower from dynamic-slice copies of the stack — see RESULTS.md; Mosaic
    caches kernel compilation by jaxpr hash, so the unrolled loop still
    compiles each kernel payload once per trunk.)

    Per-layer params keep the exact unfused tree (layer_i/self_attn/...) —
    the _LayerParams mirrors are declared in the calling BertModel's scope —
    so checkpoints, the HF converter and the freezing masks are unaffected."""
    from kindergarten_vq_vae_tpu.ops.layer_pallas import LayerGeom, fused_bert_layer

    from kindergarten_vq_vae_tpu.ops.layer_pallas import DEC_WEIGHTS, ENC_WEIGHTS

    has_cross = cfg.add_cross_attention and encoder_hidden_states is not None
    per_layer = [
        _LayerParams(cfg, has_cross, name=f"layer_{i}")()
        for i in range(cfg.num_layers)
    ]
    # cast matmul kernels to the compute dtype up front: otherwise each
    # kernel call materializes f32 weight blocks in VMEM (double the
    # footprint) before the in-kernel cast
    names = DEC_WEIGHTS if has_cross else ENC_WEIGHTS
    per_layer = [
        tuple(w.astype(cfg.dtype) if n.startswith("w") else w
              for n, w in zip(names, ws))
        for ws in per_layer
    ]

    attn_rate = 0.0 if deterministic else cfg.attention_dropout
    hid_rate = 0.0 if deterministic else cfg.hidden_dropout
    if attn_rate > 0.0 or hid_rate > 0.0:
        key = module.make_rng("dropout")
        seeds = jax.random.randint(
            key, (cfg.num_layers, 1),
            jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
            dtype=jnp.int32,
        )
    else:
        seeds = jnp.zeros((cfg.num_layers, 1), jnp.int32)

    # The tile knobs are tuned in SENTENCES at the flagship S=12; what the
    # kernels actually budget (VMEM residency, scoped-vmem stack) is ROWS
    # = sentences * s_q. At longer padded lengths (shelgon/shelgon2 pad to
    # 14) the same sentence count overflows: measured, the 32-sentence bwd
    # tile at S=14 (448 rows vs the proven 384) exceeds the scoped-vmem
    # limit by 257 KiB at bert-base. Hold the ROW budget across lengths
    # (rows %% 8 for the Mosaic sublane rule).
    def _row_capped(sentences: int, s_q: int) -> int:
        if s_q <= 12:
            return sentences
        b = max(1, (sentences * 12) // s_q)
        while b > 1 and (b * s_q) % 8:
            b -= 1
        if (b * s_q) % 8:
            # no b under the row budget satisfies the sublane rule (tiny
            # configured tiles at s_q > 12, e.g. 2 sentences at S=14 -> 14
            # rows); take the SMALLEST valid b above it instead — b=8 always
            # satisfies (8*s_q) % 8 == 0, so this terminates within the
            # proven 384-row budget for any realistic s_q
            while (b * s_q) % 8:
                b += 1
        return b

    geom = LayerGeom(
        num_heads=cfg.num_heads,
        head_dim=cfg.head_dim,
        s_q=x.shape[1],
        s_k=encoder_hidden_states.shape[1] if has_cross else x.shape[1],
        intermediate=cfg.intermediate_size,
        causal=cfg.is_decoder,
        has_cross=has_cross,
        attn_rate=attn_rate,
        hid_rate=hid_rate,
        eps=cfg.layer_norm_eps,
        gelu_exact=cfg.gelu_exact,
        block_b_fwd=_row_capped(cfg.layer_block_b_fwd, x.shape[1]),
        block_b_bwd=_row_capped(cfg.layer_block_b_bwd, x.shape[1]),
        attn_chunk=cfg.layer_attn_chunk,
        attn_chunk_fwd=cfg.layer_attn_chunk_fwd,
    )
    enc = encoder_hidden_states if has_cross else None
    emask = encoder_attention_mask if has_cross else None

    if cfg.mesh is not None:
        return _fused_trunk_sharded(
            cfg, geom, x, attention_mask, enc, emask, seeds, per_layer
        )

    # straight unrolled loop: a rolled lax.scan pays ~0.5 ms/layer of
    # dynamic-slice copies of stacked weights (and dynamic-update-slices of
    # the stacked dW in backward) — measured 200.7 -> 186.6 ms/step unrolled.
    # Mosaic caches the kernel compilation by jaxpr hash, so the payload
    # still compiles once per trunk.
    for i in range(cfg.num_layers):
        x = fused_bert_layer(geom, x, enc, attention_mask, emask,
                             seeds[i], None, *per_layer[i])
    return x


def _fused_trunk_sharded(cfg: BertConfig, geom, x, smask, enc, emask, seeds,
                         per_layer):
    """Data-parallel fused trunk: ONE shard_map over the mesh's dp axes runs
    the whole unrolled fused-layer stack on each device's local batch shard.

    Without this, any mesh forfeits the fused-kernel speedup (pallas custom
    calls are not auto-partitionable under GSPMD — XLA would all-gather the
    batch and replicate the kernel). The composition rule is the one proven
    by ops/vq_pallas.fused_vector_quantize_sharded: the kernel grid is batch-
    tiled, so each shard runs an ordinary per-shard kernel; weights enter
    replicated (in_spec P()) and their cotangents are reduced across shards
    by the shard_map transpose — no collectives inside the custom VJP.
    Activations (x, enc, masks) stay dp-sharded end to end: the only
    gradient-time collective is the dW reduction XLA already needs for DP.

    The in-kernel hash-dropout seeds get the shard index folded in, so
    dropout streams are decorrelated across shards (each shard's kernel
    hashes LOCAL row ids, which repeat per shard)."""
    from jax.sharding import PartitionSpec as P

    from kindergarten_vq_vae_tpu.ops.layer_pallas import fused_bert_layer
    from kindergarten_vq_vae_tpu.parallel.mesh import dp_axes, shard_map_nocheck

    mesh = cfg.mesh
    axes = dp_axes(mesh)
    if not axes:  # mesh with no dp axis (pure tp): per-device full batch
        for i in range(cfg.num_layers):
            x = fused_bert_layer(geom, x, enc, smask, emask, seeds[i], None,
                                 *per_layer[i])
        return x
    dp = P(axes)

    # shard_map specs are positional pytrees: materialize optional masks
    if smask is None:
        smask = jnp.ones((x.shape[0], x.shape[1]), jnp.int32)
    has_cross = enc is not None
    if has_cross and emask is None:
        emask = jnp.ones((enc.shape[0], enc.shape[1]), jnp.int32)

    n_per = len(per_layer[0])
    flat_w = [w for ws in per_layer for w in ws]
    n_layers = cfg.num_layers
    dropout_on = geom.attn_rate > 0.0 or geom.hid_rate > 0.0

    def local(x_, smask_, enc_, emask_, seeds_, *ws):
        if dropout_on:
            shard = jnp.int32(0)
            for ax in axes:  # row-major flattened dp shard index
                shard = shard * jnp.int32(mesh.shape[ax]) + (
                    jax.lax.axis_index(ax).astype(jnp.int32)
                )
            seeds_ = seeds_ + shard * jnp.int32(0x632BE5AB)
        for i in range(n_layers):
            x_ = fused_bert_layer(
                geom, x_, enc_, smask_, emask_, seeds_[i], None,
                *ws[i * n_per:(i + 1) * n_per],
            )
        return x_

    if has_cross:
        fn, enc_in, emask_in = local, enc, emask
        enc_spec = emask_spec = dp
    else:
        def fn(x_, smask_, _e, _m, seeds_, *ws):
            return local(x_, smask_, None, None, seeds_, *ws)

        enc_in = emask_in = jnp.zeros((), jnp.int32)  # placeholder leaves
        enc_spec = emask_spec = P()

    in_specs = (dp, dp, enc_spec, emask_spec, P()) + (P(),) * len(flat_w)
    mapped = shard_map_nocheck(fn, mesh=mesh, in_specs=in_specs, out_specs=dp)
    return mapped(x, smask, enc_in, emask_in, seeds, *flat_w)


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
        if cfg.fused_layer and not output_attentions:
            x = _fused_trunk(
                self, cfg, x, attention_mask, encoder_hidden_states,
                encoder_attention_mask, deterministic,
            )
        else:
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
    def __call__(self, x, word_embedding_table=None, project: bool = True):
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_size, kernel_init=_dense_init(cfg), dtype=cfg.dtype, name="transform_dense")(x)
        x = nn.gelu(x, approximate=not cfg.gelu_exact).astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="transform_layer_norm")(x)
        bias_param = self.param("decoder_bias", nn.initializers.zeros, (cfg.vocab_size,))
        if not project:
            # fused-head mode: the vocab projection happens inside the fused
            # head+CE kernel (ops/head_ce_pallas.py); param tree unchanged
            return x, bias_param
        if cfg.tie_word_embeddings:
            assert word_embedding_table is not None
            kernel = word_embedding_table.T.astype(cfg.dtype)
        else:
            kernel = self.param(
                "decoder_kernel", _dense_init(cfg), (cfg.hidden_size, cfg.vocab_size)
            ).astype(cfg.dtype)
        bias = bias_param
        # matmul in 2-D: with a 3-D (B, S, V) product XLA picks a batch-minor
        # {0,2,1} output layout and then pays a ~750 MB relayout copy to feed
        # the row-major fused-CE kernel (seen in device traces); the 2-D form
        # is born row-major and the reshape back is a free bitcast
        b, s, _ = x.shape
        x2 = x.reshape(b * s, cfg.hidden_size)
        logits = (x2 @ kernel + bias.astype(cfg.dtype)).reshape(b, s, cfg.vocab_size)
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
        if cfg.fused_head:
            assert cfg.tie_word_embeddings, "fused_head requires a tied table"
            hidden, bias = BertMLMHead(cfg, name="mlm_head")(
                out["last_hidden_state"], word_table, project=False
            )
            out["mlm_hidden"] = hidden
            out["head_table"] = word_table  # f32 param; the op casts in-kernel
            out["head_bias"] = bias
        else:
            out["logits"] = BertMLMHead(cfg, name="mlm_head")(out["last_hidden_state"], word_table)
        return out
