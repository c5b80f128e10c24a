"""Run orchestration: data loading, run-dir setup, full train/test contract.

This is the body of every reference ``models/*/main.py`` (e.g.
models/bagon/main.py:37-163), shared once: dataset -> splits -> model ->
optimizer -> run dir + run_conf.json -> (wandb) -> train -> best-val reload
-> test -> decoded_sentences dump.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import numpy as np

from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset
from kindergarten_vq_vae_tpu.data.tokenizer import _BaseTokenizer
from kindergarten_vq_vae_tpu.train.config import RunConfig
from kindergarten_vq_vae_tpu.train.engine import Engine
from kindergarten_vq_vae_tpu.utils.consts import RUN_ID_TIMESTAMP_FORMAT
from kindergarten_vq_vae_tpu.utils.params import params_summary_dict


def load_data(cfg: RunConfig):
    """Load (or generate+prepare) the dSentences artifacts; return
    (splits dict, tokenizer)."""
    d = cfg.data
    ids_path = os.path.join(d.data_dir, d.input_ids_file)
    if not os.path.exists(ids_path):
        if not d.generate_if_missing:
            raise FileNotFoundError(
                f"{ids_path} missing; run python -m kindergarten_vq_vae_tpu.data.prepare "
                f"--generate --raw-dir {d.data_dir}"
            )
        from kindergarten_vq_vae_tpu.data.generate import generate_dsentences
        from kindergarten_vq_vae_tpu.data.prepare import prepare_all

        raw_sent = os.path.join(d.data_dir, "dSentences_sentences.npy")
        if not os.path.exists(raw_sent):
            generate_dsentences(d.data_dir)
        prepare_all(d.data_dir, max_length=d.tokenized_sentence_max_length,
                    add_special_tokens=d.tokenizer_add_special_tokens)

    # memory-mapped reads: corpora larger than RAM stream from disk; the
    # batch iterator's fancy indexing copies only the touched rows
    mmap = "r" if d.mmap else None
    input_ids = np.load(os.path.join(d.data_dir, d.input_ids_file), mmap_mode=mmap)
    attention_mask = np.load(os.path.join(d.data_dir, d.attention_mask_file), mmap_mode=mmap)
    labels = np.load(os.path.join(d.data_dir, d.labels_file), mmap_mode=mmap)
    one_hot = np.load(os.path.join(d.data_dir, d.one_hot_file), mmap_mode=mmap)
    sentences = [
        s.decode() if isinstance(s, bytes) else str(s)
        for s in np.load(os.path.join(d.data_dir, d.sentences_file))
    ]

    labels8 = one_hot8 = None
    p8 = os.path.join(d.data_dir, "dSentences_latent_classes_labels8_clean.npy")
    if os.path.exists(p8):
        labels8 = np.load(p8)
        one_hot8 = np.load(os.path.join(d.data_dir, "dSentences_latent_classes_one_hot8_clean.npy"))

    # truncate/pad to configured max length (prepared arrays may be longer)
    L = d.tokenized_sentence_max_length
    if input_ids.shape[1] > L:
        input_ids = input_ids[:, :L]
        attention_mask = attention_mask[:, :L]
    elif input_ids.shape[1] < L:
        pad = L - input_ids.shape[1]
        input_ids = np.pad(input_ids, ((0, 0), (0, pad)))
        attention_mask = np.pad(attention_mask, ((0, 0), (0, pad)))

    # GPT-2 decoder configs: a second, BPE tokenization of the corpus
    # (reference dual-tokenizer path, models/bagon/main.py:65-73). Hermetic:
    # if no vocab/merges files are present, TRAIN byte-level BPE from the
    # corpus and persist the files next to the other artifacts.
    dec_input_ids = dec_attention_mask = None
    if "gpt" in cfg.model.decoder_model_name:
        from kindergarten_vq_vae_tpu.data.tokenizer import BPETokenizer

        vpath = os.path.join(d.data_dir, "gpt2_vocab.json")
        mpath = os.path.join(d.data_dir, "gpt2_merges.txt")
        if os.path.exists(vpath) and os.path.exists(mpath):
            dec_tok = BPETokenizer.from_files(vpath, mpath)
        else:
            target = cfg.model.decoder_vocab_size or 512
            dec_tok = BPETokenizer.train(sentences, vocab_size=target)
            dec_tok.save(vpath, mpath)
        if cfg.model.decoder_vocab_size and dec_tok.vocab_size > cfg.model.decoder_vocab_size:
            raise ValueError(
                f"decoder_vocab_size={cfg.model.decoder_vocab_size} < trained "
                f"BPE vocab {dec_tok.vocab_size}"
            )
        dec_input_ids, dec_attention_mask = dec_tok.encode_batch(
            sentences, max_length=L
        )

    ds = DSentences(
        input_ids=input_ids.astype(np.int32),
        attention_mask=attention_mask.astype(np.int32),
        dec_input_ids=dec_input_ids,
        dec_attention_mask=dec_attention_mask,
        labels=labels,
        one_hot=one_hot,
        labels8=labels8,
        one_hot8=one_hot8,
        sentences=sentences,
    )
    train, val, test = split_dataset(ds, d.train_split_pct, d.val_split_pct)
    splits = {"train": train, "val": val, "test": test}

    tok_path = os.path.join(d.data_dir, d.tokenizer_file)
    tokenizer = _BaseTokenizer.load(tok_path) if os.path.exists(tok_path) else None

    max_id = int(input_ids.max())
    if max_id >= cfg.model.vocab_size:
        raise ValueError(
            f"model.vocab_size={cfg.model.vocab_size} but the corpus contains "
            f"token id {max_id}; out-of-range ids would silently corrupt the "
            f"loss. Set model.vocab_size >= {max_id + 1} (tokenizer vocab: "
            f"{tokenizer.vocab_size if tokenizer else 'unknown'})."
        )
    return splits, tokenizer


def make_run_dir(cfg: RunConfig) -> str:
    run_id = datetime.now().strftime(RUN_ID_TIMESTAMP_FORMAT)
    run_path = os.path.join(cfg.runs_dir, run_id)
    os.makedirs(run_path, exist_ok=True)
    return run_path


def init_wandb(cfg: RunConfig, run_conf: dict):
    if cfg.wandb_mode == "disabled":
        return None
    try:
        import wandb

        os.environ["WANDB_SILENT"] = cfg.wandb_silent
        return wandb.init(
            project=cfg.wandb_project_name,
            group=cfg.wandb_group or None,
            job_type=cfg.wandb_job_type,
            config=run_conf,
            mode=cfg.wandb_mode,
        )
    except Exception as e:  # wandb missing or offline init failure
        print(f"[run] wandb disabled ({type(e).__name__}: {e})")
        return None


def maybe_log_code(cfg: RunConfig, wandb_run):
    """wandb code snapshot opt-in (ref models/bagon/main.py:119-120)."""
    if wandb_run is not None and cfg.wandb_log_code:
        try:
            wandb_run.log_code(".")
        except Exception:
            pass


def run_training(cfg: RunConfig, console_print: bool = True,
                 resume_from: str | None = None):
    """The full reference main() contract. Returns the Engine.

    ``resume_from``: path to an existing run dir holding a
    ``resume_state``/``resume_meta.json`` pair written by a previous run
    (cfg.resume_save_every_n_epochs > 0); training continues IN that run
    dir from the saved epoch with identical trajectory."""
    splits, tokenizer = load_data(cfg)
    run_path = resume_from if resume_from else make_run_dir(cfg)

    engine = Engine(cfg, splits, tokenizer=tokenizer, run_path=run_path)
    if resume_from:
        start = engine.restore_resume(resume_from)
        if console_print:
            print(f"[run] resumed {resume_from} at epoch {start}")

    run_conf = cfg.get_config()
    run_conf["run_id"] = os.path.basename(run_path)
    run_conf["n_params"] = params_summary_dict(
        {
            k: v
            for k, v in engine.state.params.items()
            if k in ("encoder", "decoder")
        }
    )
    if not resume_from:
        cfg.save(os.path.join(run_path, "run_conf.json"), extra={
            "run_id": run_conf["run_id"], "n_params": run_conf["n_params"],
        })

    wandb_run = init_wandb(cfg, run_conf)
    maybe_log_code(cfg, wandb_run)
    engine.fit(wandb_run=wandb_run, console_print=console_print)
    if cfg.test_stage:
        engine.test(wandb_run=wandb_run, console_print=console_print)
    if cfg.decode_dump:
        engine.dump_decoded_sentences()
    # persist the full per-epoch stats (incl. variant metrics the console
    # line abbreviates) so quality numbers are quotable from the run dir
    # without re-running eval
    try:
        with open(os.path.join(run_path, "history.json"), "w") as f:
            json.dump(engine.history, f, default=float)
    except OSError:
        pass
    if wandb_run is not None:
        wandb_run.finish()
    return engine
