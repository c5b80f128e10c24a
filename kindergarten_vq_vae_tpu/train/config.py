"""First-class, versioned run configuration.

The reference's config is a gitignored ``config.py`` star-imported by every
main (models/*/main.py:1, SURVEY §0 caveat) — the schema only exists
implicitly. Here it is an explicit dataclass tree covering the full
reconstructed surface (SURVEY §2.8), serializable to the ``run_conf.json``
contract the analyses read back (snake_case keys,
analyses/latent_traversals/...py:48-51).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class DataConfig:
    data_dir: str = "./data/dSentences"
    # artifact names inside data_dir (ref DATASET_PATH / *_PATH config keys)
    sentences_file: str = "dSentences_sentences_clean.npy"
    labels_file: str = "dSentences_latent_classes_labels_clean.npy"
    one_hot_file: str = "dSentences_latent_classes_one_hot_clean.npy"
    input_ids_file: str = "dSentences_input_ids.npy"
    attention_mask_file: str = "dSentences_attention_mask.npy"
    tokenizer_file: str = "dSentences_tokenizer.json"
    train_split_pct: float = 0.6
    val_split_pct: float = 0.2
    batch_size: int = 256
    lim_batches_train_pct: float = 1.0
    lim_batches_val_pct: float = 1.0
    lim_batches_test_pct: float = 1.0
    tokenizer_add_special_tokens: bool = True
    tokenized_sentence_max_length: int = 12
    generate_if_missing: bool = True  # synthesize the corpus when artifacts absent
    # memory-map the packed arrays on load (avoids a full-file read upfront;
    # the seed-69 split still materializes its selection)
    mmap: bool = False
    # reference-schema compat (SURVEY §2.8). Tokenizer names select the
    # tokenizer kind when their files are present locally; num_workers /
    # pin_memory are torch DataLoader knobs that have no equivalent in the
    # packed-array pipeline — accepted so reference configs load, unused.
    tokenizer_name: str = ""
    tokenizer_name_encoder: str = ""
    tokenizer_name_decoder: str = ""
    num_workers: int = 0
    pin_memory: bool = False


@dataclass
class ModelConfig:
    model_name: str = "bagon"  # bagon | shelgon | shelgon2 | shelgon3
    encoder_model_name: str = "bert-base-uncased"
    decoder_model_name: str = "bert-base-uncased"
    model_mode: str = "full"  # full | dec-head-ft | enc-head-ft-dec-head-ft | vq-ft
    cross_attn_make_trainable: bool = True
    # BERT geometry (bert-base defaults; shrink for tests/smoke runs)
    vocab_size: int = 30522
    # decoder-side overrides (ref VOCAB_SIZE_DECODER / the GPT-2 decoder
    # option, models/bagon/main.py:69-73); None -> same as encoder
    decoder_vocab_size: Optional[int] = None
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    tie_word_embeddings: bool = True
    gelu_exact: bool = True  # erf GELU (HF parity); False = tanh approx (~15% faster step)
    remat: bool = False  # jax.checkpoint per transformer layer
    compute_dtype: str = "bfloat16"  # MXU-native; 'float32' for parity checks
    # shelgon (latent-class bottleneck)
    emb_size: int = 768
    num_latent_classes: int = 5
    num_labels_per_class: int = 3
    use_mask_encoder: bool = True
    use_mask_decoder: bool = True
    # shelgon2 (per-factor discretizers)
    word_embedding_size: int = 768
    num_latent_gen_factors: int = 8
    mask_pct_train: float = 0.0
    mask_pct_val: float = 0.0
    mask_pct_test: float = 0.0
    # shelgon3 (VQ / Gumbel codebook)
    vq_mode: str = "VectorQuantizer"
    vq_n_e: int = 9
    vq_e_dim: int = 768
    vq_beta: float = 0.69
    vq_codebook_init_values_path: Optional[str] = None
    enc_out_size: int = 768
    vq_temperature: float = 1.0
    vq_kl_div_scale: float = 5e-4
    vq_straight_through: bool = False
    # "auto": fused Pallas kernel in the small/dispatch-bound regime and
    # under a dp mesh; jnp oracle at flagship row counts (DCE-fair A/B,
    # models/shelgon3.VQ_FUSED_MAX_ROWS). True/False force one path.
    vq_use_fused: object = "auto"
    fused_ce: bool = True                # fused Pallas cross-entropy (flash-style)
    # fused MLM-head + CE + argmax (ops/head_ce_pallas.py): the loss path
    # never materializes (B*S, vocab) logits separately from their reductions.
    # "store" writes the bf16 logits once from inside the fused forward (no
    # recompute in bwd); "flash" never writes them (bwd recomputes per tile);
    # "auto" -> the measured winner on TPU (RESULTS.md), off on CPU. Requires
    # a BERT decoder with tied embeddings; falls back to fused_ce otherwise.
    fused_head_ce: str = "auto"          # "auto" | "off" | "store" | "flash"
    head_ce_block_r: int = 512           # rows per head+CE kernel tile
    head_ce_block_v: int = 1024          # vocab columns per head+CE kernel tile
    # fused block-diagonal SDPA Pallas kernel for all attention (fwd+bwd).
    # "auto": on for single-device TPU, off on CPU (interpret is slow) and
    # under a GSPMD mesh (custom calls aren't auto-partitionable).
    fused_attn: str = "auto"             # "auto" | "on" | "off"
    sdpa_block_b: int = 64               # sentences per SDPA kernel tile
    # fused whole-layer Pallas kernel (ops/layer_pallas.py): one kernel per
    # BertLayer (fwd + recompute backward, weights VMEM-resident across the
    # sentence-tile grid). Supersedes fused_attn when active. Same "auto"
    # semantics: single-device TPU only.
    fused_layer: str = "auto"            # "auto" | "on" | "off"
    # tile sizes from the on-chip sweeps (RESULTS.md): bwd at 32 sentences
    # (384 rows = exact MXU tiles for every projection/wgrad matmul), the
    # bwd attention sub-chunk at 8 (the packed score matmuls waste
    # O(chunk)); fwd at 128 sentences with a 4-sentence attention chunk
    # (round-3 quiet-chip sweep: 341.7 -> 339.0 ms/step at batch 2048;
    # tbf=256 exceeds the compile budget)
    layer_block_b_fwd: int = 128         # sentences per fused-layer fwd tile
    layer_block_b_bwd: int = 32          # sentences per fused-layer bwd tile
    layer_attn_chunk: int = 8            # sentences per attention sub-chunk
    layer_attn_chunk_fwd: int = 4        # fwd-only chunk override; 0 = shared
    vq_ema_update: bool = False          # EMA codebook path (new capability)
    vq_ema_decay: float = 0.99
    # dead-code revival (new capability; counters the index collapse a
    # randomly initialized codebook exhibits — RESULTS.md): codes unused for
    # vq_dead_code_threshold consecutive steps are re-seeded from live
    # encoder outputs. 0 disables.
    vq_dead_code_threshold: int = 0
    from_pretrained_bagon: Optional[str] = None
    # staged-training warm start: load a SAME-model checkpoint (any best-slot
    # file written by ckpt/checkpoint.py) into the params at Engine init.
    # Unlike resume_from (crash recovery: restores optimizer state + epoch),
    # this starts a FRESH run/optimizer from trained weights — e.g. the
    # flagship pipeline's stage 4 continues a converged vq-ft checkpoint
    # under a different model_mode/lr (scripts/flagship_quality.py).
    init_from_ckpt: Optional[str] = None
    # pretrained warm start (local HF torch checkpoint path; optional)
    hf_encoder_checkpoint: Optional[str] = None
    hf_decoder_checkpoint: Optional[str] = None


@dataclass
class OptimConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    amsgrad: bool = True
    # fused single-pass Adam update (ops/adam_pallas.py): one read/write pass
    # per leaf, buffers reused via jit donation, ulp-identical to the optax
    # chain. Only amsgrad=True is kernelized (the reference always trains
    # with amsgrad, models/bagon/main.py:76). "auto" currently resolves OFF
    # — see ops/adam_pallas.resolve_fused_update for the axon-crash note.
    # "jnp" selects the same fused single-expression update without the
    # Pallas custom call (safe to compose with the fused trunk on axon).
    fused_update: str = "auto"           # "auto" | "on" | "off" | "jnp"
    lr_scheduler: Optional[str] = None  # None | "MultiStepLR"
    milestones: tuple = ()
    gamma: float = 0.1
    loss_recon_rescale_factor: float = 1.0
    loss_recon_weight: float = 1.0
    loss_latent_rescale_factor: float = 1.0
    loss_latent_weight: float = 1.0
    loss_vq_rescale_factor: float = 1.0
    loss_vq_weight: float = 1.0
    loss_perp_rescale_factor: float = 1.0
    loss_perp_weight: float = 1.0


@dataclass
class RunConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    n_epochs: int = 10
    n_epochs_to_decode_after: int = 5
    runs_dir: str = "./runs"
    export_checkpoint: bool = True
    # Run the test stage after fit() (reference contract: best-val reload +
    # test sweep, models/bagon/main.py:142-158). False skips it — the
    # flagship pipeline's INTERMEDIATE stages consume only the best-val
    # checkpoint, and at bert-base the test stage costs a ~4-7 min eval-step
    # compile + a full test sweep per stage (round-4 overhead measurement).
    test_stage: bool = True
    # Decode + dump reconstructed sentences (decoded_sentences.feather,
    # models/bagon/main.py:159-160). False skips both the per-batch host-side
    # tokenizer decode and the end-of-run dump — at the 242k corpus the test
    # decode dump is a 48k-sentence host loop through the ~1 ms-latency
    # tunnel (round-4 overhead measurement). The feather contract stays the
    # default; pipelines opt out per stage.
    decode_dump: bool = True
    # Best-checkpoint write cadence. 1 = reference semantics (write every
    # improved slot every epoch, models/bagon/Trainer.py:188-209). N > 1
    # batches writes: improved slots are remembered and flushed with the
    # then-current params every N epochs and at the final epoch — for long
    # runs on hosts where a bert-base bundle write is expensive
    # (scripts/flagship_quality.py uses this). 0 = flush ONLY at the final
    # epoch (one device->host fetch per run).
    ckpt_every_n_epochs: int = 1
    # When non-empty, only these best slots are ever written, e.g.
    # ("loss_recon:val",) — the flagship pipeline consumes exactly that one
    # slot per stage, and every extra slot costs a hardlink + its share of
    # the bundle write on this host's ~5 MB/s disk. Empty = all slots
    # (reference semantics: one per tracked stat per stage).
    ckpt_slots: tuple = ()
    # Async checkpoint IO: the device->host fetch stays synchronous (the
    # next step donates the param buffers) but the disk write runs on a
    # background thread (ckpt/checkpoint.AsyncCheckpointWriter) — on this
    # host's ~5 MB/s disk a bert-base bundle write is minutes while an
    # epoch is seconds. fit() drains the queue before returning, so
    # everything downstream of fit() sees durable files. False = fully
    # synchronous writes (strict write-then-continue semantics).
    ckpt_async: bool = True
    # crash-safe resume (new capability — the reference flags resume as a
    # TODO, models/bagon/main.py:155): every N epochs fit() overwrites
    # <run_dir>/resume_state (params + optimizer state + step + EMA) and
    # resume_meta.json (epoch, best trackers, history). 0 disables.
    # Restart with --resume <run_dir> (models/_cli.py).
    resume_save_every_n_epochs: int = 0
    seed: int = 0
    # PRNG implementation for in-step randomness (dropout/gumbel/perturb).
    # 'rbg' generates bits much faster on TPU (~12% step speedup at bert-base
    # batch 1024); 'threefry' is jax's default splittable PRNG.
    rng_impl: str = "rbg"
    # input perturbation (ref {ENCODER,DECODER}_PERTURB_{...}_PCT)
    encoder_perturb_train_pct: float = 0.0
    encoder_perturb_val_pct: float = 0.0
    encoder_perturb_test_pct: float = 0.0
    decoder_perturb_train_pct: float = 0.0
    decoder_perturb_val_pct: float = 0.0
    decoder_perturb_test_pct: float = 0.0
    # Bagon recon target under decoder perturbation. False replicates the
    # reference exactly (Bagon Trainer.py:103-107 targets the PERTURBED
    # decoder ids — so its perturbation never breaks the teacher-forced
    # copy path, and at bert-base the encoder representation collapses to a
    # near-constant; RESULTS.md round 3). True targets the unperturbed ids,
    # the way the reference's own Shelgon variant implements corruption
    # (shelgon/Trainer.py:117-121) — a denoising objective that forces
    # information through the encoder latent. Used by the flagship quality
    # pipeline (scripts/flagship_quality.py --dec-perturb).
    bagon_target_unperturbed: bool = False
    # observability
    wandb_project_name: str = "kindergarten-vq-vae-tpu"
    wandb_group: str = ""
    wandb_job_type: str = "train"
    wandb_mode: str = "disabled"
    wandb_silent: str = "true"
    wandb_watch_model: bool = False
    # full wandb.watch(log='all') fidelity: per-parameter 64-bin value AND
    # gradient histograms per epoch (engine._log_watch_histograms) instead
    # of the cheap per-leaf norms. Costs one extra fwd+bwd per epoch (the
    # gradient recompute) + one extra jit compile.
    wandb_watch_histograms: bool = False
    wandb_log_code: bool = False
    # jax.profiler trace of the first training epoch (SURVEY §5.1: the
    # reference has no tracing; empty = off)
    profile_dir: str = ""
    # parallelism (TPU-native; the reference has none, SURVEY §5.8)
    mesh_shape: tuple = ()        # e.g. (8,) dp or (4, 2) dp x tp
    mesh_axis_names: tuple = ()   # e.g. ("dp",) or ("dp", "tp")

    def get_config(self) -> dict:
        """Flat snake_case dict for run_conf.json (reference contract:
        models/bagon/main.py:102-111; analyses read these keys back)."""
        out = {}
        for section in (self.model, self.data, self.optim):
            out.update(dataclasses.asdict(section))
        for f in dataclasses.fields(self):
            if f.name in ("model", "data", "optim"):
                continue
            out[f.name] = getattr(self, f.name)
        out["mesh_shape"] = list(self.mesh_shape)
        out["mesh_axis_names"] = list(self.mesh_axis_names)
        out["milestones"] = list(self.optim.milestones)
        out["ckpt_slots"] = list(self.ckpt_slots)
        return out

    def save(self, path: str, extra: dict | None = None) -> None:
        conf = self.get_config()
        if extra:
            conf.update(extra)
        with open(path, "w") as fp:
            json.dump(conf, fp, default=str)

    @classmethod
    def load(cls, path: str) -> "RunConfig":
        with open(path) as fp:
            conf = json.load(fp)
        return cls.from_flat_dict(conf)

    @classmethod
    def from_flat_dict(cls, conf: dict) -> "RunConfig":
        def pick(dc_cls):
            names = {f.name for f in dataclasses.fields(dc_cls)}
            kw = {k: v for k, v in conf.items() if k in names}
            for k in ("milestones",):
                if k in kw and isinstance(kw[k], list):
                    kw[k] = tuple(kw[k])
            return dc_cls(**kw)

        top_names = {f.name for f in dataclasses.fields(cls)} - {"model", "data", "optim"}
        top = {k: v for k, v in conf.items() if k in top_names}
        for k in ("mesh_shape", "mesh_axis_names", "ckpt_slots"):
            if k in top and isinstance(top[k], list):
                top[k] = tuple(top[k])
        return cls(model=pick(ModelConfig), data=pick(DataConfig), optim=pick(OptimConfig), **top)
