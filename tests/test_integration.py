"""End-to-end integration: run_training -> run dir artifacts -> load_run ->
analyses, exercising the full reference main() + checkpoint contract."""

import json
import os

import numpy as np
import pytest

from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
from kindergarten_vq_vae_tpu.train.run import load_data, run_training


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = RunConfig(
        model=ModelConfig(
            model_name="shelgon3", vocab_size=128, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, compute_dtype="float32",
            vq_e_dim=32, enc_out_size=32, vq_n_e=5,
        ),
        data=DataConfig(
            data_dir=str(tmp / "data"), batch_size=32, tokenized_sentence_max_length=12,
            lim_batches_train_pct=0.03, lim_batches_val_pct=0.05, lim_batches_test_pct=0.05,
        ),
        optim=OptimConfig(lr=1e-3),
        n_epochs=1, n_epochs_to_decode_after=1, runs_dir=str(tmp / "runs"),
    )
    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences

    generate_dsentences(str(tmp / "data"), num_verbs=1, num_objects=1)
    engine = run_training(cfg, console_print=False)
    return cfg, engine


def test_run_dir_contract(trained_run):
    cfg, engine = trained_run
    rp = engine.run_path
    # run_conf.json with reference snake_case keys + n_params + run_id
    with open(os.path.join(rp, "run_conf.json")) as f:
        conf = json.load(f)
    for key in ("encoder_model_name", "tokenized_sentence_max_length", "vq_n_e",
                "run_id", "n_params", "model_name"):
        assert key in conf
    assert "encoder" in conf["n_params"] and "decoder" in conf["n_params"]
    # best checkpoints with the reference naming scheme (incl. loss_vq for
    # shelgon3, shelgon3/Trainer.py:251-257)
    for stat in ("loss_recon", "metric_acc", "loss_vq"):
        assert os.path.exists(os.path.join(rp, f"shelgon3_ckpt_{stat}_train_best"))
    assert os.path.exists(os.path.join(rp, "shelgon3_ckpt_loss_recon_val_best"))
    # decoded sentences dump
    assert os.path.exists(os.path.join(rp, "decoded_sentences.feather")) or os.path.exists(
        os.path.join(rp, "decoded_sentences.jsonl")
    )


def test_load_run_reconstructs_model(trained_run):
    from kindergarten_vq_vae_tpu.analyses.common import load_run

    cfg, engine = trained_run
    cfg2, model, params = load_run(engine.run_path)
    assert cfg2.model.model_name == "shelgon3"
    assert cfg2.model.vq_n_e == 5
    # restored params match the engine's best-val tree structure
    import jax

    a = jax.tree_util.tree_structure(params)
    b = jax.tree_util.tree_structure(engine.state.params)
    assert a == b


def test_analyses_on_trained_run(trained_run):
    from kindergarten_vq_vae_tpu.analyses.common import load_run
    from kindergarten_vq_vae_tpu.analyses.disentanglement import (
        unsupervised_vq_disentanglement,
    )
    from kindergarten_vq_vae_tpu.analyses.max_acc import get_max_acc_sentences

    cfg, engine = trained_run
    cfg2, model, params = load_run(engine.run_path)
    splits, tokenizer = load_data(cfg)
    codes, histograms, code_words, _metrics = unsupervised_vq_disentanglement(
        cfg2, model, params, splits, tokenizer, lim_batches_pct=0.02, batch_size=64,
    )
    assert len(codes) >= 1
    # max-acc filter over the run's decode dump
    df = get_max_acc_sentences(engine.run_path, threshold=-1.0)  # keep all
    assert len(df) == len(engine.decoded_sentences)


def _cli(module, argv, monkeypatch):
    """Invoke an analysis module's _main() with a patched argv — the same
    code path as ``python -m kindergarten_vq_vae_tpu.analyses.<name>``."""
    import sys

    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module._main()


def test_analyses_cli_entrypoints(trained_run, monkeypatch, capsys):
    """Every analysis is runnable as a run-dir script (the reference ships
    each as a standalone script, e.g. analyses/latent_arithmetics/
    latent_arithmetics_Bagon.py) — max_acc, arithmetic and latent_space on
    the shelgon3 run."""
    from kindergarten_vq_vae_tpu.analyses import arithmetic, latent_space, max_acc

    cfg, engine = trained_run
    rp = engine.run_path

    _cli(max_acc, [rp, "--threshold", "-1.0"], monkeypatch)
    assert os.path.exists(os.path.join(rp, "max_acc_sentences.feather"))

    _cli(arithmetic, [rp, "--mode", "bagon", "--factor", "verb_tense",
                      "--a", "present", "--b", "past", "--n", "8"], monkeypatch)
    out_json = os.path.join(rp, "latent_arithmetic_bagon.json")
    assert os.path.exists(out_json)
    with open(out_json) as f:
        res = json.load(f)
    assert res["base_recon_ids"] and res["shifted_recon_ids"]

    _cli(latent_space, [rp, "--batch-size", "64"], monkeypatch)
    assert os.path.exists(os.path.join(rp, f"sentence_latent_reps_test.npy"))
    out = capsys.readouterr().out
    assert "combos plotted" in out


def test_traversals_cli_entrypoint(tmp_path_factory, monkeypatch):
    """Traversal CLI on a (tiny) shelgon latent-class run — the model family
    the reference's traversal script targets."""
    from kindergarten_vq_vae_tpu.analyses import traversals

    tmp = tmp_path_factory.mktemp("trav")
    cfg = RunConfig(
        model=ModelConfig(
            model_name="shelgon", vocab_size=128, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, compute_dtype="float32",
            emb_size=32,
        ),
        data=DataConfig(
            data_dir=str(tmp / "data"), batch_size=32, tokenized_sentence_max_length=12,
            lim_batches_train_pct=0.03, lim_batches_val_pct=0.05, lim_batches_test_pct=0.05,
        ),
        optim=OptimConfig(lr=1e-3),
        n_epochs=1, n_epochs_to_decode_after=1, runs_dir=str(tmp / "runs"),
    )
    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences

    generate_dsentences(str(tmp / "data"), num_verbs=1, num_objects=1)
    engine = run_training(cfg, console_print=False)
    out = str(tmp / "traversals.json")
    _cli(traversals, [engine.run_path, "--n", "4", "--out", out], monkeypatch)
    with open(out) as f:
        res = json.load(f)
    assert res["traversed_recon_ids"] and res["original_recon_ids"]


def test_remat_engine(trained_run, tmp_path):
    """remat config trains with finite loss (memory-for-FLOPs trade)."""
    cfg, _ = trained_run
    flat = cfg.get_config()
    flat["remat"] = True
    flat["runs_dir"] = str(tmp_path)
    flat["export_checkpoint"] = False
    cfg2 = RunConfig.from_flat_dict(flat)
    from kindergarten_vq_vae_tpu.train.engine import Engine

    splits, tok = load_data(cfg2)
    eng = Engine(cfg2, splits, tokenizer=tok)
    history = eng.fit(console_print=False)
    assert np.isfinite(history[0]["train"]["loss_recon"])


def test_serve_export_roundtrip(trained_run, tmp_path, monkeypatch, capsys):
    """jax.export serving artifact: export the reconstruction forward,
    deserialize, and match the live forward exactly (serve/export.py)."""
    from kindergarten_vq_vae_tpu.serve import export as serve_export
    from kindergarten_vq_vae_tpu.serve.reconstructor import Reconstructor

    cfg, engine = trained_run
    out = str(tmp_path / "artifact")
    _cli(serve_export, [engine.run_path, "--bucket", "8", "--out", out, "--check"],
         monkeypatch)
    text = capsys.readouterr().out
    assert "check OK" in text
    assert os.path.exists(out + ".stablehlo") and os.path.exists(out + ".json")

    # a fresh process-equivalent consumer: load + run without the exporter
    import jax
    import jax.numpy as jnp

    call, meta = serve_export.load_exported(out)
    assert meta["bucket"] == 8 and meta["model_name"] == "shelgon3"
    r = Reconstructor(engine.run_path, batch_buckets=(8,))
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 100, (8, meta["seq_len"])), jnp.int32)
    mask = jnp.ones_like(ids)
    got_r, got_c = call(r.params, ids, mask)
    want_r, want_c = jax.jit(r._forward)(r.params, ids, mask)
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
