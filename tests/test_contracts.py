"""Observability + artifact contracts: wandb key schema, from_artifacts,
Shelgon2 override hooks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset
from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
from kindergarten_vq_vae_tpu.train.engine import Engine
from kindergarten_vq_vae_tpu.train.variants import build_model, init_params


def _pad_to(arr, L):
    if arr.shape[1] >= L:
        return arr[:, :L]
    return np.pad(arr, ((0, 0), (0, L - arr.shape[1])))


class FakeWandb:
    def __init__(self):
        self.logged = []

    def log(self, d):
        self.logged.append(d)


def _tiny_cfg(model_name, **kw):
    return RunConfig(
        model=ModelConfig(
            model_name=model_name, vocab_size=128, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, compute_dtype="float32",
            emb_size=32, word_embedding_size=32, vq_e_dim=32, enc_out_size=32,
            vq_n_e=5, **kw,
        ),
        data=DataConfig(batch_size=16, tokenized_sentence_max_length=12,
                        lim_batches_train_pct=0.03, lim_batches_val_pct=0.05,
                        lim_batches_test_pct=0.05),
        optim=OptimConfig(lr=1e-3),
        n_epochs=1, n_epochs_to_decode_after=10,
    )


@pytest.fixture(scope="module")
def splits(tiny_corpus):
    ds = DSentences(
        input_ids=_pad_to(tiny_corpus["input_ids"], 12),
        attention_mask=_pad_to(tiny_corpus["attention_mask"], 12),
        labels=tiny_corpus["labels_clean"],
        one_hot=tiny_corpus["one_hot_clean"],
        labels8=tiny_corpus["labels8_clean"],
        one_hot8=tiny_corpus["one_hot8_clean"],
        sentences=tiny_corpus["sentences_clean"],
    )
    tr, va, te = split_dataset(ds)
    return {"train": tr, "val": va, "test": te}


def test_wandb_key_schema_shelgon3(splits):
    """Epoch log dicts use the reference key names
    (shelgon3/Trainer.py:204-213: {stage}/loss_recon, {stage}/loss_vq,
    {stage}/perp, {stage}/acc, padding_tokens_pct/{stage}, epoch)."""
    cfg = _tiny_cfg("shelgon3")
    eng = Engine(cfg, splits)
    fake = FakeWandb()
    eng.fit(wandb_run=fake, console_print=False)
    assert len(fake.logged) == 2  # train + val for 1 epoch
    train_log = fake.logged[0]
    for key in ("epoch", "train/loss_recon", "train/loss_vq", "train/loss_full",
                "train/perp", "train/acc", "padding_tokens_pct/train"):
        assert key in train_log, f"missing {key}: {sorted(train_log)}"
    val_log = fake.logged[1]
    assert "val/loss_recon" in val_log and val_log["epoch"] == 1


def test_wandb_watch_per_layer_norms(splits):
    """wandb.watch(model, log='all') parity (models/bagon/main.py:117-118):
    per-parameter gradient AND parameter norms under the watch key style
    gradients/<dotted.path>, parameters/<dotted.path>, plus the global
    grad_norm."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg("bagon"), wandb_watch_model=True)
    eng = Engine(cfg, splits)
    fake = FakeWandb()
    eng.fit(wandb_run=fake, console_print=False)
    train_log = fake.logged[0]
    assert "train/grad_norm" in train_log
    grad_keys = [k for k in train_log if k.startswith("gradients/")]
    param_keys = [k for k in train_log if k.startswith("parameters/")]
    assert len(grad_keys) > 20, f"expected per-layer grad norms, got {grad_keys[:5]}"
    assert len(param_keys) == len(grad_keys)
    # a known leaf path exists and both sides carry finite values
    probe = [k for k in grad_keys if "layer_0" in k and "qkv" in k and k.endswith("kernel")]
    assert probe, grad_keys[:10]
    assert np.isfinite(train_log[probe[0]])
    assert np.isfinite(train_log["parameters/" + probe[0][len("gradients/"):]])


def test_from_artifacts_roundtrip(tiny_corpus):
    from kindergarten_vq_vae_tpu.data.prepare import prepare_all
    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        generate_dsentences(tmp, num_verbs=1, num_objects=1)
        art = prepare_all(tmp)
        ds = DSentences.from_artifacts(art)
    assert ds.labels8 is not None and ds.labels8.shape[1] == 8
    assert ds.one_hot8 is not None and ds.one_hot8.shape[1:] == (8, 3)
    np.testing.assert_array_equal(np.argmax(ds.one_hot8, -1), ds.labels8)
    assert len(ds) == len(ds.sentences)


def test_shelgon2_override_hooks(splits):
    """Per-factor override logits bypass gumbel sampling and pin the labels
    (the traversal-analysis hook, ref models/shelgon2/Shelgon2.py:40-44)."""
    cfg = _tiny_cfg("shelgon2")
    model = build_model(cfg, "test")
    params = init_params(cfg, jax.random.key(0))
    tr = splits["train"]
    ids = jnp.asarray(tr.input_ids[:4])
    mask = jnp.asarray(tr.attention_mask[:4])

    override = jnp.zeros((4, 3)).at[:, 2].set(1.0)  # pin tense -> class 2
    out = model.apply(
        {"params": params}, ids, mask, deterministic=True,
        overrides={"tense": override},
        rngs={"gumbel": jax.random.key(1)},
    )
    # factor order: FACTOR_NAMES index of 'tense' is 6
    labels = np.asarray(out["gen_factors_labels"])
    assert (labels[:, 6] == 2).all()
    # other factors unaffected by the override value choice
    out2 = model.apply(
        {"params": params}, ids, mask, deterministic=True,
        overrides={"tense": jnp.zeros((4, 3)).at[:, 0].set(1.0)},
        rngs={"gumbel": jax.random.key(1)},
    )
    labels2 = np.asarray(out2["gen_factors_labels"])
    assert (labels2[:, 6] == 0).all()
    np.testing.assert_array_equal(labels[:, :6], labels2[:, :6])


def test_cli_overrides():
    import importlib.util, os, sys

    spec = importlib.util.spec_from_file_location(
        "cli", os.path.join(os.path.dirname(__file__), "..", "models", "_cli.py")
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    cfg = RunConfig()
    cfg2 = cli._apply_overrides(cfg, ["vq_n_e=17", "lr=0.005", "model_mode=vq-ft"])
    assert cfg2.model.vq_n_e == 17
    assert cfg2.optim.lr == 0.005
    assert cfg2.model.model_mode == "vq-ft"
    with pytest.raises(KeyError):
        cli._apply_overrides(cfg, ["not_a_key=1"])


def test_profiler_trace_epoch(splits, tmp_path):
    flat = _tiny_cfg("bagon").get_config()
    flat["profile_dir"] = str(tmp_path / "trace")
    cfg = RunConfig.from_flat_dict(flat)
    eng = Engine(cfg, splits)
    eng.fit(console_print=False)
    import os

    files = []
    for root, _, names in os.walk(flat["profile_dir"]):
        files.extend(names)
    assert files, "no profiler trace written"


def test_cli_end_to_end_subprocess(tmp_path):
    """The public entrypoint contract: `python models/bagon/main.py` with
    overrides runs a full tiny train+test on a fresh machine (CPU)."""
    import os
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in the subprocess
    # seed a tiny RAW corpus so the subprocess's generate-if-missing prep
    # works on it instead of the full-scale (242k-sentence) default grammar
    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences

    generate_dsentences(str(tmp_path / "data"), num_verbs=1, num_objects=1)
    cmd = [
        sys.executable, os.path.join(repo, "models", "bagon", "main.py"),
        "--set", "vocab_size=128", "--set", "hidden_size=32",
        "--set", "num_layers=2", "--set", "num_heads=2",
        "--set", "intermediate_size=64", "--set", "compute_dtype='float32'",
        "--set", "batch_size=32", "--set", "n_epochs=1",
        "--set", "n_epochs_to_decode_after=5",
        "--set", "lim_batches_train_pct=0.02", "--set", "lim_batches_val_pct=0.05",
        "--set", "lim_batches_test_pct=0.05",
        "--set", f"data_dir='{tmp_path}/data'",
        "--set", f"runs_dir='{tmp_path}/runs'",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=420, cwd=repo, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    runs = os.listdir(tmp_path / "runs")
    assert len(runs) == 1
    run_dir = tmp_path / "runs" / runs[0]
    assert (run_dir / "run_conf.json").exists()
    assert any(p.startswith("bagon_ckpt_") for p in os.listdir(run_dir))


def test_wandb_watch_histograms(splits):
    """wandb_watch_histograms=True: full wandb.watch(log='all') fidelity —
    64-bin per-parameter value AND gradient histograms under the watch key
    style (ref models/bagon/main.py:117-118; wandb absent here, so the
    payload is the plain np_histogram dict)."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg("bagon"), wandb_watch_model=True,
                              wandb_watch_histograms=True)
    eng = Engine(cfg, splits)
    fake = FakeWandb()
    eng.fit(wandb_run=fake, console_print=False)
    train_log = fake.logged[0]
    grad_keys = [k for k in train_log if k.startswith("gradients/")]
    param_keys = [k for k in train_log if k.startswith("parameters/")]
    assert len(grad_keys) > 20 and len(param_keys) == len(grad_keys)
    probe = [k for k in grad_keys if "layer_0" in k and k.endswith("kernel")][0]
    for key in (probe, "parameters/" + probe[len("gradients/"):]):
        h = train_log[key]
        assert h["_type"] == "histogram"
        assert len(h["values"]) == 64 and len(h["bins"]) == 65
        assert sum(h["values"]) > 0  # every element binned
        assert h["bins"][0] < h["bins"][-1]
    # histogram mode replaces the per-leaf norm floats (no key clash)
    assert not isinstance(train_log[probe], float)
