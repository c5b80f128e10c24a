"""Kill-and-resume: a run saved mid-training and restored by a FRESH Engine
continues at the right epoch with an identical loss trajectory to an
uninterrupted run.

Resume is an acknowledged TODO in the reference
(models/bagon/main.py:155 "TODO resume from checkpoint"); here it is a real
capability: fit() overwrites <run_dir>/resume_state + resume_meta.json every
cfg.resume_save_every_n_epochs epochs, and models/_cli.py --resume <run_dir>
continues in place. Trajectory identity holds because every RNG stream
(dropout / perturb / shuffle) is keyed by (seed, epoch, step), not by
wall-clock position in the process.
"""

import os

import numpy as np
import pytest

from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset
from kindergarten_vq_vae_tpu.train.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
)
from kindergarten_vq_vae_tpu.train.engine import Engine


def _pad_to(arr, L):
    if arr.shape[1] >= L:
        return arr[:, :L]
    return np.pad(arr, ((0, 0), (0, L - arr.shape[1])))


@pytest.fixture(scope="module")
def tiny_splits(tiny_corpus):
    ids = _pad_to(tiny_corpus["input_ids"], 12)
    mask = _pad_to(tiny_corpus["attention_mask"], 12)
    ds = DSentences(
        input_ids=ids,
        attention_mask=mask,
        labels=tiny_corpus["labels_clean"],
        one_hot=tiny_corpus["one_hot_clean"],
        labels8=tiny_corpus["labels8_clean"],
        one_hot8=tiny_corpus["one_hot8_clean"],
        sentences=tiny_corpus["sentences_clean"],
    )
    tr, va, te = split_dataset(ds)
    return {"train": tr, "val": va, "test": te}


def _cfg(n_epochs: int, resume_every: int = 0) -> RunConfig:
    return RunConfig(
        model=ModelConfig(
            model_name="shelgon3",
            vocab_size=128,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            compute_dtype="float32",
            vq_e_dim=32,
            enc_out_size=32,
            vq_n_e=4,
        ),
        data=DataConfig(
            data_dir="",
            batch_size=16,
            tokenized_sentence_max_length=12,
            lim_batches_train_pct=0.05,
            lim_batches_val_pct=0.1,
            lim_batches_test_pct=0.1,
        ),
        optim=OptimConfig(lr=1e-3),
        n_epochs=n_epochs,
        n_epochs_to_decode_after=100,
        resume_save_every_n_epochs=resume_every,
        export_checkpoint=False,
    )


def _losses(history):
    return [
        (h["train"]["loss_full"], h["val"]["loss_full"])
        for h in history
        if "train" in h
    ]


def test_kill_and_resume_identical_trajectory(tiny_splits, tmp_path):
    # --- uninterrupted 4-epoch run (the golden trajectory)
    eng_full = Engine(_cfg(4), tiny_splits)
    hist_full = eng_full.fit(console_print=False)

    # --- interrupted run: 2 epochs with per-epoch resume saves, then "killed"
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    eng_a = Engine(_cfg(2, resume_every=1), tiny_splits, run_path=run_dir)
    eng_a.fit(console_print=False)
    assert os.path.exists(os.path.join(run_dir, "resume_state"))
    assert os.path.exists(os.path.join(run_dir, "resume_meta.json"))

    # --- fresh process stand-in: a brand-new Engine restores and continues
    eng_b = Engine(_cfg(4, resume_every=1), tiny_splits, run_path=run_dir)
    start = eng_b.restore_resume()
    assert start == 3
    hist_b = eng_b.fit(console_print=False)

    assert [h["epoch"] for h in hist_b if "train" in h] == [1, 2, 3, 4]
    np.testing.assert_allclose(
        _losses(hist_b), _losses(hist_full), rtol=1e-6, atol=0,
        err_msg="resumed trajectory diverged from the uninterrupted run",
    )


def test_resume_preserves_best_tracking(tiny_splits, tmp_path):
    """Best-stat trackers survive the restart: a continuation must not treat
    its first epoch as a fresh best when the killed run already did better."""
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    eng_a = Engine(_cfg(2, resume_every=1), tiny_splits, run_path=run_dir)
    eng_a.fit(console_print=False)

    eng_b = Engine(_cfg(3, resume_every=1), tiny_splits, run_path=run_dir)
    eng_b.restore_resume()
    assert eng_b._best_train is not None
    # losses recorded in the meta match the killed run's history
    assert eng_b._best_train["loss_full"] <= eng_a.history[-1]["train"]["loss_full"] + 1e-9
    eng_b.fit(console_print=False)
    assert eng_b.history[-1]["epoch"] == 3
