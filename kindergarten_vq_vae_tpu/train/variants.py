"""Per-variant model builders + loss adapters for the shared engine.

The reference clones its whole Trainer.py per variant (4 near-identical
copies, SURVEY §1); here each variant contributes only (a) a model builder
and (b) a pure ``loss_fn(params, batch, rngs, deterministic) -> (loss, aux)``
— everything else (jit, grads, stats, ckpt, logging) lives once in
train/engine.py.

``aux`` is a flat dict of scalars (stats) plus ``recon_ids`` for the decode
dumps. Scalar keys mirror the reference's wandb names per variant
(e.g. shelgon3/Trainer.py:204-213).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from kindergarten_vq_vae_tpu.models import Bagon, Shelgon, Shelgon2, Shelgon3
from kindergarten_vq_vae_tpu.nn.bert import BertConfig
from kindergarten_vq_vae_tpu.train.config import RunConfig
from kindergarten_vq_vae_tpu.ops.ce_pallas import fused_ce_loss_ids
from kindergarten_vq_vae_tpu.ops.head_ce_pallas import (
    fused_head_ce_loss,
    fused_head_ce_loss_sharded,
)
from kindergarten_vq_vae_tpu.train.losses import kl_onehot_loss, kl_recon_loss
from kindergarten_vq_vae_tpu.utils.metrics import padding_tokens_pct, seq_acc
from kindergarten_vq_vae_tpu.utils.tensor import (
    replace_pct_rand_columns,
    replace_pct_rand_values,
)

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def _resolve_auto_flag(value: str, mesh) -> bool:
    """'auto' -> on for single-device TPU only (interpret mode is slow on
    CPU; these custom calls aren't auto-partitionable under a GSPMD mesh)."""
    if value == "on":
        return True
    if value == "off":
        return False
    import jax as _jax

    return _jax.default_backend() == "tpu" and mesh is None


def _resolve_fused_layer(value: str, mesh) -> bool:
    """'auto' -> on for TPU, with OR without a mesh: under a mesh the trunk
    runs dp-sharded via shard_map (nn/bert._fused_trunk_sharded), so
    multi-chip training keeps the fused-kernel step time. Off on CPU
    (interpret mode is slow); force 'on' for CPU-mesh parity tests."""
    if value == "on":
        return True
    if value == "off":
        return False
    import jax as _jax

    return _jax.default_backend() == "tpu"


def _resolve_fused_attn(m, mesh) -> bool:
    return _resolve_auto_flag(m.fused_attn, mesh)


def _resolve_head_ce(cfg: RunConfig, mesh) -> str | None:
    """Fused head+CE mode for the loss path, or None for the logits path.
    Requires a BERT decoder with tied embeddings (the vocab projection must
    be the tied table for the in-kernel recompute/projection). Works under a
    mesh via the shard_map wrapper.

    'auto' -> the measured winner (RESULTS.md round-3 A/B): on a single
    chip the XLA head matmul + streaming ``fused_ce_loss_ids`` beats the
    fused kernel at every tile (18.72 vs best 19.83 ms fwd+bwd at batch
    2048), so auto resolves OFF; under a mesh the fused kernel is the only
    path that never materializes per-shard (rows, vocab) logits, so auto
    resolves to 'store' on TPU. Off on CPU (interpret-mode kernels are
    slow); explicit 'store'/'flash' is always honored (tests)."""
    m = cfg.model
    v = m.fused_head_ce
    if v == "off":
        return None
    if "gpt" in m.decoder_model_name or not m.tie_word_embeddings:
        return None
    if v in ("store", "flash"):
        return v
    import jax as _jax

    return "store" if (mesh is not None and _jax.default_backend() == "tpu") else None


def bert_configs(cfg: RunConfig, mesh=None, fused_head: bool = False):
    """(encoder BertConfig, decoder BertConfig-or-GPT2Config).

    A 'gpt' decoder_model_name selects the GPT-2 decoder, mirroring the
    reference's BERT-vs-GPT2 decoder selectors (models/bagon/Bagon.py:109-124,
    main.py:69-73)."""
    m = cfg.model
    common = dict(
        vocab_size=m.vocab_size,
        hidden_size=m.hidden_size,
        num_layers=m.num_layers,
        num_heads=m.num_heads,
        intermediate_size=m.intermediate_size,
        hidden_dropout=m.hidden_dropout,
        attention_dropout=m.attention_dropout,
        tie_word_embeddings=m.tie_word_embeddings,
        gelu_exact=m.gelu_exact,
        remat=m.remat,
        fused_sdpa=_resolve_fused_attn(m, mesh),
        sdpa_block_b=m.sdpa_block_b,
        fused_layer=_resolve_fused_layer(m.fused_layer, mesh),
        mesh=mesh if _resolve_fused_layer(m.fused_layer, mesh) else None,
        layer_block_b_fwd=m.layer_block_b_fwd,
        layer_block_b_bwd=m.layer_block_b_bwd,
        layer_attn_chunk=m.layer_attn_chunk,
        layer_attn_chunk_fwd=m.layer_attn_chunk_fwd,
        dtype=_DTYPES[m.compute_dtype],
    )
    enc = BertConfig(add_pooler=True, **common)
    dec_vocab = m.decoder_vocab_size or m.vocab_size
    if "gpt" in m.decoder_model_name:
        from kindergarten_vq_vae_tpu.nn.gpt2 import GPT2Config

        dec = GPT2Config(
            vocab_size=dec_vocab,
            hidden_size=m.hidden_size,
            num_layers=m.num_layers,
            num_heads=m.num_heads,
            hidden_dropout=m.hidden_dropout,
            attention_dropout=m.attention_dropout,
            tie_word_embeddings=m.tie_word_embeddings,
            add_cross_attention=True,
            dtype=_DTYPES[m.compute_dtype],
        )
    else:
        dec = BertConfig(
            is_decoder=True, add_cross_attention=True, add_pooler=False,
            fused_head=fused_head,
            **{**common, "vocab_size": dec_vocab},
        )
    return enc, dec


def _load_codebook_init(cfg: RunConfig):
    path = cfg.model.vq_codebook_init_values_path
    if path is None:
        return None
    data = np.load(path) if path.endswith(".npy") else np.load(path, allow_pickle=True)
    return jnp.asarray(data)


def build_model(cfg: RunConfig, stage: str = "train", mesh=None, fused_head: bool = False):
    enc, dec = bert_configs(cfg, mesh=mesh, fused_head=fused_head)
    m = cfg.model
    name = m.model_name
    if name == "bagon":
        return Bagon(enc, dec)
    if name == "shelgon":
        return Shelgon(
            enc,
            dec,
            emb_size=m.emb_size,
            seq_len=cfg.data.tokenized_sentence_max_length,
            num_latent_classes=m.num_latent_classes,
            num_labels_per_class=m.num_labels_per_class,
        )
    if name == "shelgon2":
        mask_pct = {
            "train": m.mask_pct_train,
            "val": m.mask_pct_val,
            "test": m.mask_pct_test,
        }[stage]
        return Shelgon2(
            enc,
            dec,
            word_emb_size=m.word_embedding_size,
            sentence_len=cfg.data.tokenized_sentence_max_length,
            num_latent_gen_factors=m.num_latent_gen_factors,
            mask_pct=mask_pct,
        )
    if name == "shelgon3":
        return Shelgon3(
            enc,
            dec,
            vq_mode=m.vq_mode,
            vq_n_e=m.vq_n_e,
            vq_e_dim=m.vq_e_dim,
            vq_beta=m.vq_beta,
            vq_temperature=m.vq_temperature,
            vq_kl_div_scale=m.vq_kl_div_scale,
            vq_straight_through=m.vq_straight_through,
            vq_use_fused=m.vq_use_fused,
            vq_ema_update=m.vq_ema_update,
            vq_init_values=_load_codebook_init(cfg),
            vq_mesh=mesh,
        )
    raise ValueError(f"unknown model_name {name}")


def init_params(cfg: RunConfig, key) -> dict:
    model = build_model(cfg)
    b, s = 2, cfg.data.tokenized_sentence_max_length
    ids = jnp.zeros((b, s), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    rngs = {"params": key, "dropout": key, "gumbel": key, "perturb": key}
    name = cfg.model.model_name
    if name in ("bagon", "shelgon"):
        variables = model.init(rngs, ids, mask, ids, mask, deterministic=True)
    else:
        variables = model.init(rngs, ids, mask, deterministic=True)
    return variables["params"]


def _valid_row(batch) -> jnp.ndarray:
    b = batch["input_ids"].shape[0]
    return (jnp.arange(b) < batch["n_valid"]).astype(jnp.float32)


def make_loss_fn(cfg: RunConfig, stage: str, mesh=None) -> Callable:
    """Build the pure loss fn for a stage ('train'|'val'|'test').

    When ``mesh`` (with a "dp" axis) is given, the fused VQ kernel runs
    per-shard via shard_map inside the model (NEXT.md #5)."""
    head_mode = _resolve_head_ce(cfg, mesh)
    model = build_model(cfg, stage, mesh=mesh, fused_head=head_mode is not None)
    name = cfg.model.model_name
    o = cfg.optim
    vocab = cfg.model.vocab_size
    dec_vocab = cfg.model.decoder_vocab_size or vocab
    enc_pct = getattr(cfg, f"encoder_perturb_{stage}_pct")
    dec_pct = getattr(cfg, f"decoder_perturb_{stage}_pct")
    is_training = stage == "train"
    br, bv = cfg.model.head_ce_block_r, cfg.model.head_ce_block_v

    dp = ()
    if mesh is not None:
        from kindergarten_vq_vae_tpu.parallel.mesh import dp_axes

        dp = dp_axes(mesh)

    def _recon(out, target_ids, valid):
        """(loss_recon, recon_ids) — the fused head+CE+argmax kernel when
        resolved on (never a separate logits materialization/argmax pass),
        else the streaming CE(+argmax) kernel over XLA logits, else the
        pure-XLA custom-VJP loss (always GSPMD-partitionable)."""
        if head_mode is not None:
            args = (out["mlm_hidden"], out["head_table"], out["head_bias"],
                    target_ids, valid)
            if mesh is not None and dp:
                return fused_head_ce_loss_sharded(
                    *args, mesh, dp, head_mode, br, bv)
            return fused_head_ce_loss(*args, None, head_mode, br, bv)
        logits = out["logits"]
        if cfg.model.fused_ce and mesh is None:
            return fused_ce_loss_ids(logits, target_ids, valid)
        return kl_recon_loss(logits, target_ids, valid), jnp.argmax(logits, axis=-1)

    def bagon_loss(params, batch, rngs, deterministic):
        valid = _valid_row(batch)
        k1, k2 = jax.random.split(rngs["perturb"])
        dec_src = batch.get("dec_input_ids", batch["input_ids"])
        dec_mask = batch.get("dec_attention_mask", batch["attention_mask"])
        enc_ids = replace_pct_rand_values(k1, batch["input_ids"], enc_pct, 0, vocab)
        dec_ids = replace_pct_rand_values(k2, dec_src, dec_pct, 0, dec_vocab)
        out = model.apply(
            {"params": params},
            enc_ids,
            batch["attention_mask"],
            dec_ids,
            dec_mask,
            deterministic=deterministic,
            rngs={k: v for k, v in rngs.items() if k != "perturb"},
        )
        # reference parity: the Bagon loss targets the PERTURBED decoder ids
        # (Trainer.py:103-107). bagon_target_unperturbed=True switches to the
        # Shelgon-style denoising target (clean ids) — see config.py.
        target_ids = dec_src if cfg.bagon_target_unperturbed else dec_ids
        loss_recon, recon_ids = _recon(out, target_ids, valid)
        acc, acc_per_sentence = seq_acc(recon_ids, target_ids)
        aux = {
            "loss_recon": loss_recon,
            "loss_full": loss_recon,
            "metric_acc": acc,
            "padding_tokens_pct": padding_tokens_pct(batch["input_ids"]),
            "recon_ids": recon_ids,
            "acc_per_sentence": acc_per_sentence,
            "target_ids": target_ids,
        }
        return loss_recon, aux

    def shelgon_loss(params, batch, rngs, deterministic):
        valid = _valid_row(batch)
        k1, k2 = jax.random.split(rngs["perturb"])
        dec_src = batch.get("dec_input_ids", batch["input_ids"])
        # column-wise corruption (shelgon/Trainer.py:93-107 uses
        # change_percentage_of_elements on dim=1)
        enc_ids = replace_pct_rand_columns(k1, batch["input_ids"], enc_pct, 0, vocab)
        dec_ids = replace_pct_rand_columns(k2, dec_src, dec_pct, 0, dec_vocab)
        enc_mask = batch["attention_mask"] if cfg.model.use_mask_encoder else None
        dec_mask = (batch.get("dec_attention_mask", batch["attention_mask"])
                    if cfg.model.use_mask_decoder else None)
        out = model.apply(
            {"params": params},
            enc_ids,
            enc_mask,
            dec_ids,
            dec_mask,
            deterministic=deterministic,
            rngs={k: v for k, v in rngs.items() if k != "perturb"},
        )
        # NOTE parity: the reference's recon target is the *unperturbed*
        # decoder ids in shelgon (Trainer.py:117-121 uses input_ids_decoder,
        # not the perturbed copy)
        loss_recon, recon_ids = _recon(out, dec_src, valid)
        loss_pred = kl_onehot_loss(out["pred_latent_logits"], batch["one_hot"], valid)
        loss_full = loss_recon + loss_pred
        acc, acc_per_sentence = seq_acc(recon_ids, dec_src)
        pred_labels = jnp.argmax(out["pred_latent_classes"], axis=-1)
        acc_pred, _ = seq_acc(pred_labels, batch["labels"])
        aux = {
            "loss_recon": loss_recon,
            "loss_pred": loss_pred,
            "loss_full": loss_full,
            "metric_acc": acc,
            "metric_acc_pred": acc_pred,
            "padding_tokens_pct": padding_tokens_pct(batch["input_ids"]),
            "recon_ids": recon_ids,
            "acc_per_sentence": acc_per_sentence,
            "target_ids": dec_src,
        }
        return loss_full, aux

    def shelgon2_loss(params, batch, rngs, deterministic):
        valid = _valid_row(batch)
        out = model.apply(
            {"params": params},
            batch["input_ids"],
            batch["attention_mask"],
            deterministic=deterministic,
            rngs=rngs,
        )
        loss_recon, recon_ids = _recon(out, batch["input_ids"], valid)
        # latent logits come out (B, 3, F); the reference permutes to (B, F, 3)
        # before the loss (shelgon2/Trainer.py:95)
        latent_logits = jnp.transpose(out["gen_factors_logits"], (0, 2, 1))
        loss_latent = kl_onehot_loss(latent_logits, batch["one_hot8"], valid)
        loss_recon = loss_recon * o.loss_recon_rescale_factor * o.loss_recon_weight
        loss_latent = loss_latent * o.loss_latent_rescale_factor * o.loss_latent_weight
        loss_full = loss_recon + loss_latent
        acc, acc_per_sentence = seq_acc(recon_ids, batch["input_ids"])
        acc_latent, _ = seq_acc(out["gen_factors_labels"], batch["labels8"])
        aux = {
            "loss_recon": loss_recon,
            "loss_latent": loss_latent,
            "loss_full": loss_full,
            "metric_acc": acc,
            "metric_latent_acc": acc_latent,
            "padding_tokens_pct": padding_tokens_pct(batch["input_ids"]),
            "recon_ids": recon_ids,
            "acc_per_sentence": acc_per_sentence,
            "target_ids": batch["input_ids"],
            "gen_factors_labels": out["gen_factors_labels"],
        }
        return loss_full, aux

    def shelgon3_loss(params, batch, rngs, deterministic):
        valid = _valid_row(batch)
        # opt-in decoder-input corruption (decoder_perturb_{stage}_pct): the
        # reference's shelgon3 has NO perturbator (Shelgon.py:50-71 feeds the
        # same ids both sides), which leaves the teacher-forced copy path
        # open — measured at bert-base to re-collapse codebook utilization
        # to perp 1.0 when the decoder trains (RESULTS.md stage 4). The
        # recon target stays the CLEAN ids (denoising, like shelgon_loss).
        dec_input = None
        if dec_pct:
            k2 = jax.random.split(rngs["perturb"])[1]
            dec_input = replace_pct_rand_values(
                k2, batch["input_ids"], dec_pct, 0, dec_vocab)
        out = model.apply(
            {"params": params},
            batch["input_ids"],
            batch["attention_mask"],
            deterministic=deterministic,
            is_training=is_training,
            decoder_input_ids=dec_input,
            rngs={k: v for k, v in rngs.items() if k != "perturb"},
        )
        loss_recon, recon_ids = _recon(out, batch["input_ids"], valid)
        loss_recon = loss_recon * o.loss_recon_rescale_factor * o.loss_recon_weight
        loss_vq = out["vq_loss"] * o.loss_vq_rescale_factor * o.loss_vq_weight
        loss_full = loss_recon + loss_vq
        acc, acc_per_sentence = seq_acc(recon_ids, batch["input_ids"])
        aux = {
            "loss_recon": loss_recon,
            "loss_vq": loss_vq,
            "loss_full": loss_full,
            "metric_perp": out["perplexity"],
            "metric_acc": acc,
            "padding_tokens_pct": padding_tokens_pct(batch["input_ids"]),
            "recon_ids": recon_ids,
            "acc_per_sentence": acc_per_sentence,
            "target_ids": batch["input_ids"],
            "min_encoding_indices": out["min_encoding_indices"],
        }
        if out["ema_stats"] is not None:
            aux["ema_counts"] = out["ema_stats"]["counts"]
            aux["ema_sum_z"] = out["ema_stats"]["sum_z"]
        if cfg.model.vq_dead_code_threshold > 0 and cfg.model.vq_mode == "VectorQuantizer":
            # candidate re-seed rows for dead-code revival (first 4*n_e
            # encoder outputs of the batch, detached)
            m = 4 * cfg.model.vq_n_e
            aux["z_rows"] = jax.lax.stop_gradient(
                out["encoder_last_hidden_state"].reshape(-1, cfg.model.vq_e_dim)[:m]
            )
        return loss_full, aux

    return {
        "bagon": bagon_loss,
        "shelgon": shelgon_loss,
        "shelgon2": shelgon2_loss,
        "shelgon3": shelgon3_loss,
    }[name]


# stats that are scalars and get accumulated per epoch, per variant
STAT_KEYS = {
    "bagon": ("loss_recon", "loss_full", "metric_acc", "padding_tokens_pct"),
    "shelgon": ("loss_recon", "loss_pred", "loss_full", "metric_acc", "metric_acc_pred", "padding_tokens_pct"),
    "shelgon2": ("loss_recon", "loss_latent", "loss_full", "metric_acc", "metric_latent_acc", "padding_tokens_pct"),
    "shelgon3": ("loss_recon", "loss_vq", "loss_full", "metric_perp", "metric_acc", "padding_tokens_pct"),
}

# direction for "best" tracking: min for losses, max for metrics
BEST_MODES = {
    "loss_recon": "min",
    "loss_pred": "min",
    "loss_latent": "min",
    "loss_vq": "min",
    "loss_full": "min",
    "metric_acc": "max",
    "metric_acc_pred": "max",
    "metric_latent_acc": "max",
    "metric_perp": "max",  # perplexity should approach the codebook size
}

# stats that trigger a best-checkpoint write, per variant
# (ref: bagon/Trainer.py:290-296 saves loss_recon + metric_acc bests;
#  shelgon3/Trainer.py:251-257 adds loss_vq)
CKPT_KEYS = {
    "bagon": ("loss_recon", "metric_acc"),
    "shelgon": ("loss_recon", "metric_acc"),
    "shelgon2": ("loss_recon", "metric_acc"),
    "shelgon3": ("loss_recon", "metric_acc", "loss_vq"),
}
