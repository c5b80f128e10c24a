"""Shelgon3: classic VQ-VAE codebook bottleneck (or Gumbel codebook quantizer).

Reference: models/shelgon3/Shelgon.py:26-73.
- encoder last_hidden_state -> quantizer -> decoder cross-attends to z_q (:52-71)
- VectorQuantizer path returns (vq_loss, z_q, perplexity, indices) — here
  either the pure-jnp oracle or the fused Pallas kernel (config switch).
- GumbelQuantizer path returns (z_q, kl_diff, indices) with the
  unique-code-count perplexity proxy (:61-65), computed on-device.
- warm start from a Bagon checkpoint (:41-45) is handled by
  ckpt.checkpoint.load_bagon_into_shelgon3 (a pytree merge, not a module
  concern).

EMA codebook mode (new capability, required by the build brief): when
``ema_update=True`` the codebook param receives no gradient (it is updated
by train.engine via ops.vq.ema_codebook_update from the kernel's
counts/sum_z statistics) and the VQ loss reduces to the commitment term.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from kindergarten_vq_vae_tpu.nn.bert import BertConfig, BertLMHeadModel, BertModel
from kindergarten_vq_vae_tpu.nn.gpt2 import GPT2Config, GPT2LMHeadModel
from kindergarten_vq_vae_tpu.ops.gumbel import gumbel_quantize, unique_count_perplexity
from kindergarten_vq_vae_tpu.ops.vq import vector_quantize
from kindergarten_vq_vae_tpu.ops.vq_pallas import (
    fused_vector_quantize,
    fused_vector_quantize_sharded,
)


# Measured crossover for the unmeshed fused-kernel-vs-oracle choice
# (scripts/ab_vq_tile.py, DCE-fair: loss+perplexity consumed, quiet chip,
# 2026-08-20): at (12288, 768)x9 the XLA-fused jnp oracle wins (266.7 us vs
# 342.1/331.4 us at block_rows 512/1024 — the kernel re-reads z per pass
# while XLA fuses the distance+argmin+losses into fewer passes at large row
# counts); at (3072, 768)x9 and below the fused kernel wins (dispatch- and
# fusion-boundary-bound regime, RESULTS.md round 2: 1.45-1.6x). block_rows
# >= 2048 exceeds the default 16 MiB scoped-vmem budget (compile error).
# NOTE: the threshold is INTERPOLATED between the two measured A/B points
# (fused wins at 3072 rows, oracle at 12288; RESULTS.md round-4 DCE-fair
# table) — the exact crossover in the 3072-12288 band is unmeasured, so
# "auto" may pick the slightly slower path there; both paths are correct
# and within ~1.6x of each other at these sizes.
VQ_FUSED_MAX_ROWS = 8192


def resolve_vq_fused(use, rows: int, meshed: bool) -> bool:
    """The vq_use_fused policy: True/False are forced; "auto" follows the
    measured crossover (fused under a dp mesh or below VQ_FUSED_MAX_ROWS
    rows, jnp oracle at flagship row counts)."""
    if use == "auto":
        return meshed or rows <= VQ_FUSED_MAX_ROWS
    return bool(use)


class VectorQuantizerModule(nn.Module):
    n_e: int
    e_dim: int
    beta: float
    use_fused: object = "auto"  # "auto" | True | False
    ema_update: bool = False
    init_values: Optional[jnp.ndarray] = None
    # when a mesh with a dp axis is given, the fused kernel runs per-shard
    # via shard_map instead of letting GSPMD replicate it behind an
    # all-gather of z (NEXT.md #5)
    mesh: Optional[object] = None
    dp_axis: str = "dp"

    @nn.compact
    def __call__(self, z):
        def _init(key, shape, dtype=jnp.float32):
            if self.init_values is not None:
                return jnp.asarray(self.init_values, dtype)
            return jax.random.uniform(key, shape, dtype, -1.0 / self.n_e, 1.0 / self.n_e)

        codebook = self.param("codebook", _init, (self.n_e, self.e_dim))
        if self.ema_update:
            # codebook is trained by EMA statistics, not by gradient
            codebook = jax.lax.stop_gradient(codebook)
        axes = tuple(
            n for n in getattr(self.mesh, "axis_names", ()) if str(n).startswith("dp")
        )
        meshed = self.mesh is not None and bool(axes)
        use = resolve_vq_fused(self.use_fused, z.shape[0] * z.shape[1], meshed)
        if use and meshed:
            # under a dp mesh the shard_map'd kernel is the only choice that
            # avoids a GSPMD batch all-gather around the custom call
            return fused_vector_quantize_sharded(
                z, codebook, self.beta, self.mesh,
                axes if len(axes) > 1 else axes[0],
            )
        quantize = fused_vector_quantize if use else vector_quantize
        return quantize(z, codebook, self.beta)


class GumbelQuantizerModule(nn.Module):
    enc_out_size: int
    n_embed: int
    embedding_dim: int
    temperature: float
    kl_div_scale: float
    straight_through: bool

    @nn.compact
    def __call__(self, z, is_training: bool):
        init = nn.initializers.normal(0.02)
        proj_kernel = self.param("proj_kernel", init, (self.enc_out_size, self.n_embed))
        proj_bias = self.param("proj_bias", nn.initializers.zeros, (self.n_embed,))
        codebook = self.param("codebook", init, (self.n_embed, self.embedding_dim))
        key = self.make_rng("gumbel")
        return gumbel_quantize(
            key,
            z,
            proj_kernel,
            proj_bias,
            codebook,
            self.temperature,
            self.kl_div_scale,
            self.straight_through,
            is_training,
        )


class Shelgon3(nn.Module):
    enc_cfg: BertConfig
    dec_cfg: object  # BertConfig or GPT2Config
    vq_mode: str = "VectorQuantizer"  # or "GumbelQuantizer"
    vq_n_e: int = 9
    vq_e_dim: int = 768
    vq_beta: float = 0.69
    vq_temperature: float = 1.0
    vq_kl_div_scale: float = 5e-4
    vq_straight_through: bool = False
    vq_use_fused: object = "auto"  # "auto" | True | False (see VQ_FUSED_MAX_ROWS)
    vq_ema_update: bool = False
    vq_init_values: Optional[jnp.ndarray] = None
    vq_mesh: Optional[object] = None
    vq_dp_axis: str = "dp"

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        deterministic: bool = True,
        is_training: bool = False,
        output_attentions: bool = False,
        decoder_input_ids=None,
    ):
        # decoder_input_ids: opt-in divergence from the reference, whose
        # shelgon3 forward feeds the SAME ids to encoder and decoder
        # (Shelgon.py:50-71) — with clean teacher forcing the decoder can
        # copy its own input and the encoder/codebook re-collapses to one
        # code (measured: FLAGSHIP stage-4 "full" run, RESULTS.md). The
        # train loss passes perturbed ids here (decoder_perturb_*_pct)
        # to keep reconstruction flowing through the quantized latents.
        enc_out = BertModel(self.enc_cfg, name="encoder")(
            input_ids, attention_mask=attention_mask, deterministic=deterministic
        )
        embeds = enc_out["last_hidden_state"]
        assert embeds.shape[-1] == self.vq_e_dim, (
            "embedding dim of encoder output must match e_dim"  # Shelgon.py:54
        )

        if self.vq_mode == "VectorQuantizer":
            vq = VectorQuantizerModule(
                n_e=self.vq_n_e,
                e_dim=self.vq_e_dim,
                beta=self.vq_beta,
                use_fused=self.vq_use_fused,
                ema_update=self.vq_ema_update,
                init_values=self.vq_init_values,
                mesh=self.vq_mesh,
                dp_axis=self.vq_dp_axis,
                name="vector_quantizer",
            )(embeds)
            z_q = vq.z_q
            vq_loss = vq.loss
            perplexity = vq.perplexity
            indices = vq.indices
            ema_stats = {"counts": vq.counts, "sum_z": vq.sum_z}
        elif self.vq_mode == "GumbelQuantizer":
            out = GumbelQuantizerModule(
                enc_out_size=self.enc_cfg.hidden_size,
                n_embed=self.vq_n_e,
                embedding_dim=self.vq_e_dim,
                temperature=self.vq_temperature,
                kl_div_scale=self.vq_kl_div_scale,
                straight_through=self.vq_straight_through,
                name="gumbel_quantizer",
            )(embeds, is_training)
            z_q = out.z_q
            vq_loss = out.diff
            # unique-count proxy (Shelgon.py:65), on-device
            perplexity = unique_count_perplexity(out.indices, self.vq_n_e)
            indices = out.indices[..., None]
            ema_stats = None
        else:
            raise ValueError(f"{self.vq_mode} vector quantizer mode NOT supported")

        dec_out = (GPT2LMHeadModel if isinstance(self.dec_cfg, GPT2Config) else BertLMHeadModel)(self.dec_cfg, name="decoder")(
            input_ids if decoder_input_ids is None else decoder_input_ids,
            attention_mask=attention_mask,
            encoder_hidden_states=z_q,
            deterministic=deterministic,
            output_attentions=output_attentions,
        )
        from kindergarten_vq_vae_tpu.models.bagon import HEAD_KEYS

        result = {
            **{k: dec_out[k] for k in HEAD_KEYS if k in dec_out},
            "vq_loss": vq_loss,
            "perplexity": perplexity,
            "min_encoding_indices": indices,
            "z_q": z_q,
            "encoder_last_hidden_state": embeds,
            "ema_stats": ema_stats,
        }
        if output_attentions:
            result["decoder_attentions"] = dec_out["attentions"]
            result["decoder_cross_attentions"] = dec_out["cross_attentions"]
        return result
