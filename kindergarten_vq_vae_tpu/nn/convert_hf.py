"""HF-torch BERT checkpoint -> Flax param-tree conversion.

Replicates the initialization semantics of
``EncoderDecoderModel.from_encoder_decoder_pretrained("bert-base-uncased", ...)``
(ref models/bagon/Bagon.py:25-31): the encoder gets every pretrained weight;
the decoder gets every pretrained MLM weight while its cross-attention
blocks (absent from the MLM checkpoint) keep their fresh random init.

Takes a torch ``state_dict``-like mapping (name -> numpy array), so it works
on any locally available checkpoint — including HF models constructed from
config with random init (how the golden parity tests exercise it with zero
network access). torch Linear stores (out, in); Flax Dense kernels are
(in, out), hence the transposes. Q/K/V (and cross-attention K/V) are packed
into this framework's fused projections.
"""

from __future__ import annotations

import numpy as np

from kindergarten_vq_vae_tpu.nn.bert import BertConfig


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _layer_norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _trunk_params(sd, cfg: BertConfig, prefix: str, fresh_params=None) -> dict:
    """Convert a BertModel trunk. ``fresh_params`` supplies cross-attention
    (and any other missing) subtrees from a freshly initialized param tree."""
    p: dict = {}
    emb = f"{prefix}embeddings"
    p["embeddings"] = {
        "word_embeddings": {"embedding": _np(sd[f"{emb}.word_embeddings.weight"])},
        "position_embeddings": _np(sd[f"{emb}.position_embeddings.weight"]),
        "token_type_embeddings": {"embedding": _np(sd[f"{emb}.token_type_embeddings.weight"])},
        "layer_norm": _layer_norm(sd, f"{emb}.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layer.{i}"
        q = _linear(sd, f"{lp}.attention.self.query")
        k = _linear(sd, f"{lp}.attention.self.key")
        v = _linear(sd, f"{lp}.attention.self.value")
        layer = {
            "self_attn": {
                "qkv": {
                    "kernel": np.concatenate([q["kernel"], k["kernel"], v["kernel"]], axis=1),
                    "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
                },
                "out": _linear(sd, f"{lp}.attention.output.dense"),
                "layer_norm": _layer_norm(sd, f"{lp}.attention.output.LayerNorm"),
            },
            "mlp": {
                "intermediate": _linear(sd, f"{lp}.intermediate.dense"),
                "output": _linear(sd, f"{lp}.output.dense"),
                "layer_norm": _layer_norm(sd, f"{lp}.output.LayerNorm"),
            },
        }
        if cfg.add_cross_attention:
            if f"{lp}.crossattention.self.query.weight" in sd:
                cq = _linear(sd, f"{lp}.crossattention.self.query")
                ck = _linear(sd, f"{lp}.crossattention.self.key")
                cv = _linear(sd, f"{lp}.crossattention.self.value")
                layer["cross_attn"] = {
                    "q": cq,
                    "kv": {
                        "kernel": np.concatenate([ck["kernel"], cv["kernel"]], axis=1),
                        "bias": np.concatenate([ck["bias"], cv["bias"]]),
                    },
                    "out": _linear(sd, f"{lp}.crossattention.output.dense"),
                    "layer_norm": _layer_norm(sd, f"{lp}.crossattention.output.LayerNorm"),
                }
            else:
                # checkpoint has no cross-attention (plain MLM checkpoint):
                # keep the fresh init — from_encoder_decoder_pretrained parity
                assert fresh_params is not None, "need fresh params for missing cross-attention"
                layer["cross_attn"] = fresh_params[f"layer_{i}"]["cross_attn"]
        p[f"layer_{i}"] = layer

    if cfg.add_pooler:
        if f"{prefix}pooler.dense.weight" in sd:
            p["pooler"] = _linear(sd, f"{prefix}pooler.dense")
        elif fresh_params is not None and "pooler" in fresh_params:
            p["pooler"] = fresh_params["pooler"]
    return p


def convert_encoder_state_dict(sd, cfg: BertConfig, fresh_params=None) -> dict:
    """torch BertModel state_dict -> params for nn.bert.BertModel."""
    prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
    return _trunk_params(sd, cfg, prefix, fresh_params)


def convert_decoder_state_dict(sd, cfg: BertConfig, fresh_params=None) -> dict:
    """torch BertLMHeadModel state_dict -> params for nn.bert.BertLMHeadModel."""
    fresh_trunk = None if fresh_params is None else fresh_params.get("bert")
    trunk = _trunk_params(sd, cfg, "bert.", fresh_trunk)
    head = {
        "transform_dense": _linear(sd, "cls.predictions.transform.dense"),
        "transform_layer_norm": _layer_norm(sd, "cls.predictions.transform.LayerNorm"),
        "decoder_bias": _np(sd["cls.predictions.bias"]),
    }
    if not cfg.tie_word_embeddings:
        head["decoder_kernel"] = _np(sd["cls.predictions.decoder.weight"]).T
    return {"bert": trunk, "mlm_head": head}


def init_encoder_decoder(
    key,
    enc_cfg: BertConfig,
    dec_cfg: BertConfig,
    encoder_state_dict=None,
    decoder_state_dict=None,
    seq_len: int = 16,
):
    """Initialize (encoder_params, decoder_params), optionally warm-started
    from torch state_dicts with from_encoder_decoder_pretrained semantics."""
    import jax
    import jax.numpy as jnp

    from kindergarten_vq_vae_tpu.nn.bert import BertLMHeadModel, BertModel

    k_enc, k_dec = jax.random.split(key)
    dummy_ids = jnp.zeros((1, seq_len), jnp.int32)
    dummy_mask = jnp.ones((1, seq_len), jnp.int32)
    dummy_hidden = jnp.zeros((1, seq_len, enc_cfg.hidden_size), jnp.float32)

    enc_params = BertModel(enc_cfg).init(k_enc, dummy_ids, dummy_mask)["params"]
    dec_params = BertLMHeadModel(dec_cfg).init(
        k_dec, dummy_ids, dummy_mask, encoder_hidden_states=dummy_hidden
    )["params"]

    if encoder_state_dict is not None:
        enc_params = jax.tree_util.tree_map(
            jnp.asarray, convert_encoder_state_dict(encoder_state_dict, enc_cfg, enc_params)
        )
    if decoder_state_dict is not None:
        dec_params = jax.tree_util.tree_map(
            jnp.asarray, convert_decoder_state_dict(decoder_state_dict, dec_cfg, dec_params)
        )
    return enc_params, dec_params


def _t(x):
    import numpy as np

    return np.asarray(x).T


def _export_trunk(trunk: dict, cfg: BertConfig, prefix: str) -> dict:
    """Flax BertModel trunk params -> HF torch-style state_dict entries with
    the given key prefix ('' for a bare BertModel, 'bert.' inside an
    LMHeadModel)."""
    import numpy as np

    sd: dict = {}
    emb = trunk["embeddings"]
    sd[f"{prefix}embeddings.word_embeddings.weight"] = np.asarray(emb["word_embeddings"]["embedding"])
    sd[f"{prefix}embeddings.position_embeddings.weight"] = np.asarray(emb["position_embeddings"])
    sd[f"{prefix}embeddings.token_type_embeddings.weight"] = np.asarray(emb["token_type_embeddings"]["embedding"])
    sd[f"{prefix}embeddings.LayerNorm.weight"] = np.asarray(emb["layer_norm"]["scale"])
    sd[f"{prefix}embeddings.LayerNorm.bias"] = np.asarray(emb["layer_norm"]["bias"])
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layer.{i}"
        layer = trunk[f"layer_{i}"]
        qkv_k = np.asarray(layer["self_attn"]["qkv"]["kernel"])
        qkv_b = np.asarray(layer["self_attn"]["qkv"]["bias"])
        h = cfg.hidden_size
        for name, sl in (("query", slice(0, h)), ("key", slice(h, 2 * h)), ("value", slice(2 * h, 3 * h))):
            sd[f"{lp}.attention.self.{name}.weight"] = qkv_k[:, sl].T
            sd[f"{lp}.attention.self.{name}.bias"] = qkv_b[sl]
        sd[f"{lp}.attention.output.dense.weight"] = _t(layer["self_attn"]["out"]["kernel"])
        sd[f"{lp}.attention.output.dense.bias"] = np.asarray(layer["self_attn"]["out"]["bias"])
        sd[f"{lp}.attention.output.LayerNorm.weight"] = np.asarray(layer["self_attn"]["layer_norm"]["scale"])
        sd[f"{lp}.attention.output.LayerNorm.bias"] = np.asarray(layer["self_attn"]["layer_norm"]["bias"])
        if "cross_attn" in layer:
            ca = layer["cross_attn"]
            kv_k = np.asarray(ca["kv"]["kernel"])
            kv_b = np.asarray(ca["kv"]["bias"])
            sd[f"{lp}.crossattention.self.query.weight"] = _t(ca["q"]["kernel"])
            sd[f"{lp}.crossattention.self.query.bias"] = np.asarray(ca["q"]["bias"])
            sd[f"{lp}.crossattention.self.key.weight"] = kv_k[:, :h].T
            sd[f"{lp}.crossattention.self.key.bias"] = kv_b[:h]
            sd[f"{lp}.crossattention.self.value.weight"] = kv_k[:, h:].T
            sd[f"{lp}.crossattention.self.value.bias"] = kv_b[h:]
            sd[f"{lp}.crossattention.output.dense.weight"] = _t(ca["out"]["kernel"])
            sd[f"{lp}.crossattention.output.dense.bias"] = np.asarray(ca["out"]["bias"])
            sd[f"{lp}.crossattention.output.LayerNorm.weight"] = np.asarray(ca["layer_norm"]["scale"])
            sd[f"{lp}.crossattention.output.LayerNorm.bias"] = np.asarray(ca["layer_norm"]["bias"])
        sd[f"{lp}.intermediate.dense.weight"] = _t(layer["mlp"]["intermediate"]["kernel"])
        sd[f"{lp}.intermediate.dense.bias"] = np.asarray(layer["mlp"]["intermediate"]["bias"])
        sd[f"{lp}.output.dense.weight"] = _t(layer["mlp"]["output"]["kernel"])
        sd[f"{lp}.output.dense.bias"] = np.asarray(layer["mlp"]["output"]["bias"])
        sd[f"{lp}.output.LayerNorm.weight"] = np.asarray(layer["mlp"]["layer_norm"]["scale"])
        sd[f"{lp}.output.LayerNorm.bias"] = np.asarray(layer["mlp"]["layer_norm"]["bias"])
    if "pooler" in trunk:
        sd[f"{prefix}pooler.dense.weight"] = _t(trunk["pooler"]["kernel"])
        sd[f"{prefix}pooler.dense.bias"] = np.asarray(trunk["pooler"]["bias"])
    return sd


def export_encoder_state_dict(params: dict, cfg: BertConfig) -> dict:
    """Inverse converter: Flax BertModel params -> HF torch-style state_dict
    (numpy values) with the bare-BertModel key layout — the reference's
    ``encoder_state_dict`` bundle entry (models/bagon/Trainer.py:283)."""
    return _export_trunk(params, cfg, "")


def export_decoder_state_dict(params: dict, cfg: BertConfig) -> dict:
    """Inverse converter: Flax BertLMHeadModel params -> HF torch-style
    state_dict (numpy values). Lets weights trained here load into the
    reference's PyTorch stack (checkpoint-ecosystem bridge)."""
    import numpy as np

    sd = _export_trunk(params["bert"], cfg, "bert.")
    head = params["mlm_head"]
    sd["cls.predictions.transform.dense.weight"] = _t(head["transform_dense"]["kernel"])
    sd["cls.predictions.transform.dense.bias"] = np.asarray(head["transform_dense"]["bias"])
    sd["cls.predictions.transform.LayerNorm.weight"] = np.asarray(head["transform_layer_norm"]["scale"])
    sd["cls.predictions.transform.LayerNorm.bias"] = np.asarray(head["transform_layer_norm"]["bias"])
    sd["cls.predictions.bias"] = np.asarray(head["decoder_bias"])
    sd["cls.predictions.decoder.bias"] = np.asarray(head["decoder_bias"])
    if cfg.tie_word_embeddings:
        sd["cls.predictions.decoder.weight"] = sd["bert.embeddings.word_embeddings.weight"]
    else:
        sd["cls.predictions.decoder.weight"] = _t(head["decoder_kernel"])
    return sd
