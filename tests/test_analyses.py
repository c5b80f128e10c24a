"""Analyses-suite tests over tiny trained-for-one-epoch models."""

import os

import jax
import numpy as np
import pytest

from kindergarten_vq_vae_tpu.analyses.arithmetic import (
    latent_arithmetic_bagon,
    latent_arithmetic_shelgon_conditioning,
    latent_arithmetic_shelgon_sentence,
)
from kindergarten_vq_vae_tpu.analyses.cross_attention import (
    extract_cross_attention,
    plot_cross_attention,
)
from kindergarten_vq_vae_tpu.analyses.disentanglement import (
    unsupervised_vq_disentanglement,
)
from kindergarten_vq_vae_tpu.analyses.latent_space import latent_space_visualization
from kindergarten_vq_vae_tpu.analyses.max_acc import get_max_acc_sentences
from kindergarten_vq_vae_tpu.analyses.traversals import latent_traversals_shelgon
from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset
from kindergarten_vq_vae_tpu.train.codebook_init import compute_codebook_init
from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
from kindergarten_vq_vae_tpu.train.variants import build_model, init_params



def _pad_to(arr, L):
    import numpy as _np

    if arr.shape[1] >= L:
        return arr[:, :L]
    return _np.pad(arr, ((0, 0), (0, L - arr.shape[1])))

def _tiny_cfg(model_name: str) -> RunConfig:
    return RunConfig(
        model=ModelConfig(
            model_name=model_name,
            vocab_size=128,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            compute_dtype="float32",
            emb_size=32,
            word_embedding_size=32,
            vq_e_dim=32,
            enc_out_size=32,
            vq_n_e=5,
        ),
        data=DataConfig(batch_size=16, tokenized_sentence_max_length=12),
        optim=OptimConfig(lr=1e-3),
    )


@pytest.fixture(scope="module")
def splits(tiny_corpus):
    ids, mask = _pad_to(tiny_corpus["input_ids"], 12), _pad_to(tiny_corpus["attention_mask"], 12)
    ds = DSentences(
        input_ids=ids,
        attention_mask=mask,
        labels=tiny_corpus["labels_clean"],
        one_hot=tiny_corpus["one_hot_clean"],
        sentences=tiny_corpus["sentences_clean"],
    )
    tr, va, te = split_dataset(ds)
    return {"train": tr, "val": va, "test": te}


def _small_batch(split, n=8):
    return {
        "input_ids": split.input_ids[:n],
        "attention_mask": split.attention_mask[:n],
    }


def test_disentanglement(splits, tiny_corpus, tmp_path):
    cfg = _tiny_cfg("shelgon3")
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(0))
    codes, histograms, code_words, metrics = unsupervised_vq_disentanglement(
        cfg, model, params, splits, tiny_corpus["tokenizer"],
        results_dir=str(tmp_path), lim_batches_pct=0.2, batch_size=32,
    )
    assert len(codes) >= 1 and all(0 <= c < cfg.model.vq_n_e for c in codes)
    assert (tmp_path / "dSentences_words_of_interest_histograms.json").exists()
    assert (tmp_path / "dSentences_vq_words_distrib.json").exists()
    assert (tmp_path / "dSentences_vq_vector_populated.txt").exists()
    # quantitative factor<->code metrics emitted alongside the histograms
    assert (tmp_path / "dSentences_vq_factor_metrics.json").exists()
    assert metrics is not None
    for m in metrics.values():
        assert 0.0 <= m["nmi"] <= 1.0 + 1e-9
        assert 0.0 <= m["purity"] <= 1.0 + 1e-9
    # "i" is a word of interest present in the corpus -> histogram populated
    assert sum(histograms["i"].values()) > 0
    # every populated code maps to at least one word
    for c in codes:
        assert len(code_words[c]) > 0


def test_factor_code_metrics_synthetic():
    """Perfectly disentangled codes -> nmi/purity 1 at the right position;
    codes independent of the factor -> nmi ~0 and purity ~baseline."""
    from kindergarten_vq_vae_tpu.analyses.disentanglement import factor_code_metrics

    rng = np.random.default_rng(0)
    n, s, n_e = 600, 6, 9
    labels = rng.integers(0, 3, size=(n, 2))
    codes = rng.integers(0, n_e, size=(n, s))
    codes[:, 2] = labels[:, 0] + 3  # factor 0 fully encoded at position 2
    mask = np.ones((n, s), np.int32)
    m = factor_code_metrics(codes, mask, labels, n_e,
                            factor_names=("enc", "rand"))
    assert m["enc"]["nmi"] > 0.999 and m["enc"]["position"] == 2
    assert m["enc"]["gap"] > 0.9
    assert m["rand"]["nmi"] < 0.05
    assert abs(m["rand"]["purity"] - m["rand"]["baseline"]) < 0.05
    # constant factor handled without div-by-zero
    const = np.zeros((n, 1), np.int64)
    mc = factor_code_metrics(codes, mask, const, n_e, factor_names=("c",))
    assert mc["c"]["nmi"] == 0.0


def test_latent_traversals_shelgon(splits, tiny_corpus):
    cfg = _tiny_cfg("shelgon")
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(0))
    b = _small_batch(splits["train"])
    override = np.zeros((5, 3), np.float32)
    override[:, 0] = 1.0
    out = latent_traversals_shelgon(
        model, params, b["input_ids"], b["attention_mask"], override,
        tokenizer=tiny_corpus["tokenizer"],
    )
    assert out["original_recon_ids"].shape == b["input_ids"].shape
    assert out["traversed_recon_ids"].shape == b["input_ids"].shape
    assert len(out["traversed_recon"]) == len(b["input_ids"])


@pytest.mark.parametrize("which", ["conditioning", "sentence", "bagon"])
def test_latent_arithmetic(splits, tiny_corpus, which):
    name = "bagon" if which == "bagon" else "shelgon"
    cfg = _tiny_cfg(name)
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(0))
    tr = splits["train"]
    a, b_, t = _small_batch(tr, 4), {
        "input_ids": tr.input_ids[4:8], "attention_mask": tr.attention_mask[4:8]
    }, {
        "input_ids": tr.input_ids[8:12], "attention_mask": tr.attention_mask[8:12]
    }
    fn = {
        "conditioning": latent_arithmetic_shelgon_conditioning,
        "sentence": latent_arithmetic_shelgon_sentence,
        "bagon": latent_arithmetic_bagon,
    }[which]
    out = fn(model, params, a, b_, t, tokenizer=tiny_corpus["tokenizer"])
    assert out["delta"].shape[-1] == cfg.model.hidden_size
    assert out["shifted_recon_ids"].shape == t["input_ids"].shape
    assert len(out["shifted_recon"]) == 4


def test_masked_decoder_inputs_force_latent_path(splits, tiny_corpus):
    """--dec-input mask: decoder inputs become all-[MASK] at visible positions
    (padding preserved), and the analyses accept them as overrides."""
    from kindergarten_vq_vae_tpu.analyses.arithmetic import masked_decoder_inputs
    from kindergarten_vq_vae_tpu.data.tokenizer import MASK, PAD

    tok = tiny_corpus["tokenizer"]
    tr = splits["train"]
    b = _small_batch(tr, 4)
    dec = masked_decoder_inputs(tok, b["input_ids"], b["attention_mask"])
    am = np.asarray(b["attention_mask"])
    assert (dec[am == 1] == tok.vocab[MASK]).all()
    assert (dec[am == 0] == np.asarray(b["input_ids"])[am == 0]).all()

    from kindergarten_vq_vae_tpu.analyses.arithmetic import randomized_decoder_inputs

    rnd = randomized_decoder_inputs(tok, b["input_ids"], b["attention_mask"], pct=0.9)
    assert rnd.shape == np.asarray(b["input_ids"]).shape
    assert (rnd[am == 0] == np.asarray(b["input_ids"])[am == 0]).all()
    assert (rnd[am == 1] != np.asarray(b["input_ids"])[am == 1]).mean() > 0.5

    cfg = _tiny_cfg("bagon")
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(0))
    a, b_, t = b, {
        "input_ids": tr.input_ids[4:8], "attention_mask": tr.attention_mask[4:8]
    }, {
        "input_ids": tr.input_ids[8:12], "attention_mask": tr.attention_mask[8:12]
    }
    dec_t = masked_decoder_inputs(tok, t["input_ids"], t["attention_mask"])
    out = latent_arithmetic_bagon(
        model, params, a, b_, t, tokenizer=tok, decoder_input_ids=dec_t
    )
    assert out["shifted_recon_ids"].shape == t["input_ids"].shape

    cfg_s = _tiny_cfg("shelgon")
    model_s = build_model(cfg_s, "test")
    params_s = init_params(cfg_s, jax.random.key(0))
    override = np.zeros((5, 3), np.float32)
    override[:, 0] = 1.0
    from kindergarten_vq_vae_tpu.analyses.traversals import latent_traversals_shelgon

    out_t = latent_traversals_shelgon(
        model_s, params_s, t["input_ids"], t["attention_mask"], override,
        tokenizer=tok, decoder_input_ids=dec_t,
    )
    assert out_t["traversed_recon_ids"].shape == np.asarray(t["input_ids"]).shape


def test_cross_attention_extract_and_plot(splits, tmp_path):
    cfg = _tiny_cfg("shelgon3")
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(0))
    b = _small_batch(splits["train"], 16)
    out = extract_cross_attention(
        model, params, b["input_ids"], b["attention_mask"], batch_size=8,
        out_path=str(tmp_path / "attns.npz"),
    )
    L, H, S = cfg.model.num_layers, cfg.model.num_heads, 12
    assert out["cross_attns"].shape == (L, H, S, S)
    assert out["self_attns"].shape == (L, H, S, S)
    # the two kinds must differ (the reference saved cross into both files —
    # fixed, SURVEY §2.9.8)
    assert not np.allclose(out["cross_attns"], out["self_attns"])
    assert os.path.exists(tmp_path / "attns.npz")
    paths = plot_cross_attention(out["cross_attns"][:1, :1], str(tmp_path / "plots"))
    if paths:  # matplotlib available
        assert all(os.path.exists(p) for p in paths)


def test_latent_space_visualization(tmp_path):
    rng = np.random.default_rng(0)
    latents = rng.normal(size=(100, 8))
    labels = rng.integers(0, 2, (100, 2))
    combos = [(0, 0), (1, 1)]
    pts = latent_space_visualization(
        latents, labels, combos, out_path=str(tmp_path / "scatter.png")
    )
    assert set(pts) <= set(combos)
    for v in pts.values():
        assert v.min() >= 0.0 and v.max() <= 1.0


def test_max_acc_filter(tmp_path):
    import pandas as pd

    rows = [
        {"epoch": 1, "stage": "test", "input_sentence": "a", "recon_sentence": "a", "sentence_acc": 1.0},
        {"epoch": 1, "stage": "test", "input_sentence": "b", "recon_sentence": "c", "sentence_acc": 0.5},
    ]
    pd.DataFrame(rows).to_feather(tmp_path / "decoded_sentences.feather")
    out = get_max_acc_sentences(str(tmp_path))
    assert len(out) == 1 and out.iloc[0].input_sentence == "a"
    assert (tmp_path / "max_acc_sentences.md").exists()


def test_codebook_init_kmeans(splits):
    cfg = _tiny_cfg("shelgon3")
    cb, diag = compute_codebook_init(
        cfg, splits["train"], n_e=5, batch_size=64, return_diagnostics=True
    )
    assert cb.shape == (5, cfg.model.hidden_size)
    assert np.isfinite(cb).all()
    # distinct centroids
    assert len(np.unique(cb.round(4), axis=0)) == 5
    # collapse detector: a random-init encoder is far from the degenerate
    # regime (centroids coincide, per-element std ~0.01 — RESULTS.md round 3);
    # the round-4 RELATIVE gate (centroid gap vs in-cluster noise) must
    # clear its 0.1 abort threshold comfortably
    assert diag["centroid_dist_min"] > 1e-2
    assert diag["encoder_per_element_std"] > 0.05
    assert diag["separation_ratio"] > 0.1
    assert diag["in_cluster_rms"] > 0.0


def test_compute_sentence_latents(splits):
    from kindergarten_vq_vae_tpu.analyses.latent_space import compute_sentence_latents

    cfg = _tiny_cfg("bagon")
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(0))
    tr = splits["train"]
    latents = compute_sentence_latents(
        model, params, tr.input_ids[:40], tr.attention_mask[:40], batch_size=16
    )
    assert latents.shape == (40, cfg.model.hidden_size)
    assert np.isfinite(latents).all()
    # pooler output is tanh-bounded
    assert np.abs(latents).max() <= 1.0 + 1e-5
