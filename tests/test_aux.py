"""Aux subsystems: resume state, archive discretizer, profiling helpers,
grad-norm observability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset
from kindergarten_vq_vae_tpu.models.archive_sentence_discretizer import (
    ArchiveSentenceDiscretizer,
)
from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
from kindergarten_vq_vae_tpu.train.engine import Engine
from kindergarten_vq_vae_tpu.utils.profiling import StepTimer, benchmark_fn


def _pad_to(arr, L):
    if arr.shape[1] >= L:
        return arr[:, :L]
    return np.pad(arr, ((0, 0), (0, L - arr.shape[1])))


def _tiny_cfg(model_name="bagon", **model_kw):
    return RunConfig(
        model=ModelConfig(
            model_name=model_name, vocab_size=128, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, compute_dtype="float32",
            emb_size=32, word_embedding_size=32, vq_e_dim=32, enc_out_size=32,
            **model_kw,
        ),
        data=DataConfig(batch_size=16, tokenized_sentence_max_length=12,
                        lim_batches_train_pct=0.05, lim_batches_val_pct=0.1,
                        lim_batches_test_pct=0.1),
        optim=OptimConfig(lr=1e-3),
        n_epochs=1,
        n_epochs_to_decode_after=10,
    )


@pytest.fixture(scope="module")
def splits(tiny_corpus):
    ds = DSentences(
        input_ids=_pad_to(tiny_corpus["input_ids"], 12),
        attention_mask=_pad_to(tiny_corpus["attention_mask"], 12),
        labels=tiny_corpus["labels_clean"],
        one_hot=tiny_corpus["one_hot_clean"],
        sentences=tiny_corpus["sentences_clean"],
    )
    tr, va, te = split_dataset(ds)
    return {"train": tr, "val": va, "test": te}


def test_resume_roundtrip(splits, tmp_path):
    cfg = _tiny_cfg()
    eng = Engine(cfg, splits)
    eng.fit(console_print=False)
    step_before = int(eng.state.step)
    eng.save_state(str(tmp_path / "state"))

    eng2 = Engine(cfg, splits)
    assert int(eng2.state.step) == 0
    eng2.restore_state(str(tmp_path / "state"))
    assert int(eng2.state.step) == step_before
    a = np.asarray(eng.state.params["encoder"]["pooler"]["kernel"])
    b = np.asarray(eng2.state.params["encoder"]["pooler"]["kernel"])
    np.testing.assert_array_equal(a, b)
    # optimizer moments restored too -> continued training is identical
    eng2.fit(console_print=False)
    assert int(eng2.state.step) > step_before


def test_init_from_ckpt(splits, tmp_path):
    """Staged training: a SAME-model checkpoint loads as fresh-run init
    (cfg.model.init_from_ckpt) — weights match the checkpoint, optimizer and
    step counters start from zero (unlike resume_state)."""
    from kindergarten_vq_vae_tpu.ckpt.checkpoint import save_checkpoint

    cfg = _tiny_cfg("shelgon3")
    eng = Engine(cfg, splits)
    eng.fit(console_print=False)
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, eng.state.params)

    flat = cfg.get_config()
    flat.update(init_from_ckpt=ck, model_mode="vq-ft")
    cfg2 = RunConfig.from_flat_dict(flat)
    eng2 = Engine(cfg2, splits)
    np.testing.assert_array_equal(
        np.asarray(eng.state.params["vector_quantizer"]["codebook"]),
        np.asarray(eng2.state.params["vector_quantizer"]["codebook"]),
    )
    np.testing.assert_array_equal(
        np.asarray(eng.state.params["encoder"]["pooler"]["kernel"]),
        np.asarray(eng2.state.params["encoder"]["pooler"]["kernel"]),
    )
    assert int(eng2.state.step) == 0  # fresh run, not a resume
    eng2.fit(console_print=False)  # trains under the new mode
    assert int(eng2.state.step) > 0


def test_archive_sentence_discretizer_shapes():
    m = ArchiveSentenceDiscretizer(word_embedding_size=32, sentence_length=12)
    x = jnp.ones((4, 32))
    rngs = {"params": jax.random.key(0), "gumbel": jax.random.key(1)}
    params = m.init(rngs, x)["params"]
    sent, factors, labels = m.apply({"params": params}, x, rngs={"gumbel": jax.random.key(2)})
    assert sent.shape == (4, 12, 32)
    assert factors.shape == (4, 8, 3)
    assert labels.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(factors.sum(-1)), 1.0, rtol=1e-5)


def test_grad_norm_observability(splits):
    cfg = _tiny_cfg()
    flat = cfg.get_config()
    flat["wandb_watch_model"] = True
    cfg = RunConfig.from_flat_dict(flat)
    eng = Engine(cfg, splits)
    history = eng.fit(console_print=False)
    assert "grad_norm" in history[0]["train"]
    assert history[0]["train"]["grad_norm"] > 0
    assert "grad_norm" not in history[0]["val"]


def test_step_timer_and_benchmark():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] >= 0

    f = jax.jit(lambda x: x * 2)
    out = benchmark_fn(f, (jnp.ones((8, 8)),), n_steps=3, warmup=1)
    assert out["steps_per_sec"] > 0
