"""Train-layer tests: freezing masks, optimizer, engine end-to-end,
checkpointing, EMA codebook path, config roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from kindergarten_vq_vae_tpu.ckpt.checkpoint import (
    load_bagon_into_model,
    restore_checkpoint,
    save_checkpoint,
)
from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset
from kindergarten_vq_vae_tpu.train.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
)
from kindergarten_vq_vae_tpu.train.engine import Engine
from kindergarten_vq_vae_tpu.train.freezing import trainable_mask
from kindergarten_vq_vae_tpu.train.optim import make_lr_schedule
from kindergarten_vq_vae_tpu.train.variants import init_params



def _pad_to(arr, L):
    import numpy as _np

    if arr.shape[1] >= L:
        return arr[:, :L]
    return _np.pad(arr, ((0, 0), (0, L - arr.shape[1])))

def _tiny_cfg(model_name: str, data_dir: str = "", **model_kw) -> RunConfig:
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
            **model_kw,
        ),
        data=DataConfig(
            data_dir=data_dir,
            batch_size=16,
            tokenized_sentence_max_length=12,
            lim_batches_train_pct=0.05,
            lim_batches_val_pct=0.1,
            lim_batches_test_pct=0.1,
        ),
        optim=OptimConfig(lr=1e-3),
        n_epochs=1,
        n_epochs_to_decode_after=1,
    )


@pytest.fixture(scope="module")
def tiny_splits(tiny_corpus):
    ids, mask = _pad_to(tiny_corpus["input_ids"], 12), _pad_to(tiny_corpus["attention_mask"], 12)
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


def test_freezing_mask_modes():
    cfg = _tiny_cfg("shelgon3")
    params = init_params(cfg, jax.random.key(0))

    full = traverse_util.flatten_dict(trainable_mask(params, "full"))
    assert all(full.values())

    dec_ft = traverse_util.flatten_dict(
        trainable_mask(params, "dec-head-ft", cross_attn_trainable=True)
    )
    # encoder frozen
    assert not any(v for k, v in dec_ft.items() if k[0] == "encoder")
    # quantizer trainable ("Vector Quantizer still trainable!", Bagon.py:134)
    assert all(v for k, v in dec_ft.items() if k[0] == "vector_quantizer")
    # head + cross-attn trainable; other decoder layers frozen
    assert dec_ft[("decoder", "mlm_head", "transform_dense", "kernel")]
    assert dec_ft[("decoder", "mlm_head", "decoder_bias")]
    assert not dec_ft[("decoder", "mlm_head", "transform_layer_norm", "scale")]
    assert dec_ft[("decoder", "bert", "layer_0", "cross_attn", "q", "kernel")]
    assert not dec_ft[("decoder", "bert", "layer_0", "self_attn", "qkv", "kernel")]
    # tied-embedding torch parity: word table trainable with the head
    assert dec_ft[("decoder", "bert", "embeddings", "word_embeddings", "embedding")]

    no_ca = traverse_util.flatten_dict(
        trainable_mask(params, "dec-head-ft", cross_attn_trainable=False)
    )
    assert not no_ca[("decoder", "bert", "layer_0", "cross_attn", "q", "kernel")]

    enc_dec = traverse_util.flatten_dict(trainable_mask(params, "enc-head-ft-dec-head-ft"))
    assert enc_dec[("encoder", "layer_1", "mlp", "output", "kernel")]  # last layer
    assert not enc_dec[("encoder", "layer_0", "mlp", "output", "kernel")]
    assert enc_dec[("encoder", "pooler", "kernel")]

    vq_ft = traverse_util.flatten_dict(trainable_mask(params, "vq-ft"))
    assert not any(v for k, v in vq_ft.items() if k[0] in ("encoder", "decoder"))
    assert all(v for k, v in vq_ft.items() if k[0] == "vector_quantizer")

    with pytest.raises(ValueError):
        trainable_mask(params, "bogus")


def test_frozen_params_do_not_move(tiny_splits):
    cfg = _tiny_cfg("shelgon3", model_mode="vq-ft")
    eng = Engine(cfg, tiny_splits)
    before = jax.tree_util.tree_map(np.asarray, eng.state.params)
    eng.fit(console_print=False)
    after = eng.state.params
    # encoder/decoder untouched in vq-ft
    for side in ("encoder", "decoder"):
        b = traverse_util.flatten_dict(before[side])
        a = traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray, after[side]))
        for k in b:
            np.testing.assert_array_equal(b[k], a[k])
    # quantizer codebook moved
    assert not np.allclose(
        np.asarray(before["vector_quantizer"]["codebook"]),
        np.asarray(after["vector_quantizer"]["codebook"]),
    )


def test_engine_end_to_end_bagon(tiny_splits, tmp_path, tiny_corpus):
    cfg = _tiny_cfg("bagon")
    eng = Engine(cfg, tiny_splits, tokenizer=tiny_corpus["tokenizer"], run_path=str(tmp_path))
    history = eng.fit(console_print=False)
    assert len(history) == 1
    assert np.isfinite(history[0]["train"]["loss_recon"])
    assert np.isfinite(history[0]["val"]["loss_recon"])
    # val best checkpoint written and restorable
    ckpt = tmp_path / "bagon_ckpt_loss_recon_val_best"
    assert ckpt.exists()
    stats = eng.test(console_print=False)
    assert np.isfinite(stats["loss_recon"])
    assert len(eng.decoded_sentences) > 0
    row = eng.decoded_sentences[0]
    assert {"epoch", "stage", "input_sentence", "recon_sentence", "sentence_acc"} <= set(row)
    assert "verb_tense" in row  # explicit factor names attached
    out = eng.dump_decoded_sentences()
    assert out is not None and os.path.exists(out)


def test_ema_codebook_training(tiny_splits):
    cfg = _tiny_cfg("shelgon3", vq_ema_update=True, vq_n_e=4)
    eng = Engine(cfg, tiny_splits)
    cb_before = np.asarray(eng.state.params["vector_quantizer"]["codebook"])
    eng.fit(console_print=False)
    cb_after = np.asarray(eng.state.params["vector_quantizer"]["codebook"])
    assert not np.allclose(cb_before, cb_after)  # EMA moved it (no gradient)
    assert eng.state.ema is not None
    assert np.isfinite(cb_after).all()


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg("bagon")
    params = init_params(cfg, jax.random.key(0))
    path = str(tmp_path / "ck")
    save_checkpoint(path, params)
    restored = restore_checkpoint(path, params)
    flat_a = traverse_util.flatten_dict(params)
    flat_b = traverse_util.flatten_dict(restored)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))


def test_bagon_warm_start_into_shelgon3(tmp_path):
    bagon_cfg = _tiny_cfg("bagon")
    bagon_params = init_params(bagon_cfg, jax.random.key(0))
    path = str(tmp_path / "bagon_ck")
    save_checkpoint(path, bagon_params)

    s3_cfg = _tiny_cfg("shelgon3")
    s3_params = init_params(s3_cfg, jax.random.key(1))
    merged = load_bagon_into_model(s3_params, path)
    np.testing.assert_array_equal(
        np.asarray(merged["encoder"]["layer_0"]["self_attn"]["qkv"]["kernel"]),
        np.asarray(bagon_params["encoder"]["layer_0"]["self_attn"]["qkv"]["kernel"]),
    )
    # quantizer untouched
    np.testing.assert_array_equal(
        np.asarray(merged["vector_quantizer"]["codebook"]),
        np.asarray(s3_params["vector_quantizer"]["codebook"]),
    )


def test_multistep_lr_schedule():
    o = OptimConfig(lr=1.0, lr_scheduler="MultiStepLR", milestones=(10, 20), gamma=0.1)
    sched = make_lr_schedule(o)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(25)) == pytest.approx(0.01)


def test_run_config_roundtrip(tmp_path):
    cfg = _tiny_cfg("shelgon3", vq_n_e=7, vq_beta=0.5)
    path = str(tmp_path / "run_conf.json")
    cfg.save(path)
    loaded = RunConfig.load(path)
    assert loaded.model.vq_n_e == 7
    assert loaded.model.vq_beta == 0.5
    assert loaded.model.model_name == "shelgon3"
    assert loaded.data.batch_size == cfg.data.batch_size
    # flat dict exposes reference snake_case keys
    flat = loaded.get_config()
    for key in ("encoder_model_name", "tokenized_sentence_max_length", "vq_n_e", "lr"):
        assert key in flat


def test_dead_code_reset_op():
    from kindergarten_vq_vae_tpu.ops.vq import dead_code_reset

    codebook = jnp.asarray(np.full((4, 8), 100.0), jnp.float32)  # far from data
    dead = jnp.asarray([0, 98, 99, 0], jnp.int32)
    counts = jnp.asarray([5.0, 0.0, 0.0, 1.0])
    z_rows = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
    new_cb, new_dead = dead_code_reset(codebook, dead, counts, z_rows, jax.random.key(0), threshold=100)
    # code 2 hit the threshold (99+1=100) -> reset near data; code 1 not yet
    assert not np.allclose(np.asarray(new_cb[2]), 100.0)
    assert np.abs(np.asarray(new_cb[2])).max() < 50
    np.testing.assert_array_equal(np.asarray(new_cb[0]), np.asarray(codebook[0]))
    np.testing.assert_array_equal(np.asarray(new_cb[1]), np.asarray(codebook[1]))
    assert int(new_dead[2]) == 0 and int(new_dead[1]) == 99
    # used codes reset their counter
    assert int(new_dead[0]) == 0 and int(new_dead[3]) == 0


def test_dead_code_reset_in_engine(tiny_splits):
    cfg = _tiny_cfg("shelgon3", vq_n_e=4, vq_dead_code_threshold=1)
    eng = Engine(cfg, tiny_splits)
    assert eng.state.dead_steps is not None
    cb_before = np.asarray(eng.state.params["vector_quantizer"]["codebook"])
    eng.fit(console_print=False)
    assert eng.state.dead_steps is not None
    cb_after = np.asarray(eng.state.params["vector_quantizer"]["codebook"])
    assert np.isfinite(cb_after).all()
    assert not np.allclose(cb_before, cb_after)


def test_bagon_denoising_target_switch():
    """bagon_target_unperturbed=True targets the CLEAN decoder ids under
    perturbation (the Shelgon-style denoising objective, config.py), while
    the default replicates the reference's perturbed-target Bagon loss
    (Bagon Trainer.py:103-107). With 100% decoder corruption the two
    targets — and both the loss and the aux target_ids — must differ."""
    import dataclasses

    from kindergarten_vq_vae_tpu.train.variants import make_loss_fn

    cfg = _tiny_cfg("bagon")
    cfg = dataclasses.replace(cfg, decoder_perturb_train_pct=1.0)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (8, 12)), jnp.int32),
        "attention_mask": jnp.ones((8, 12), jnp.int32),
        "n_valid": jnp.int32(8),
    }
    rngs = {
        "dropout": jax.random.key(1),
        "gumbel": jax.random.key(2),
        "perturb": jax.random.key(3),
    }

    loss_ref, aux_ref = make_loss_fn(cfg, "train")(params, batch, rngs, True)
    cfg_dn = dataclasses.replace(cfg, bagon_target_unperturbed=True)
    loss_dn, aux_dn = make_loss_fn(cfg_dn, "train")(params, batch, rngs, True)

    # denoising target is the clean ids; reference target is the corrupted copy
    np.testing.assert_array_equal(
        np.asarray(aux_dn["target_ids"]), np.asarray(batch["input_ids"])
    )
    assert not np.array_equal(
        np.asarray(aux_ref["target_ids"]), np.asarray(batch["input_ids"])
    )
    assert abs(float(loss_ref) - float(loss_dn)) > 1e-6


def test_checkpoint_multi_and_bitcast_dtypes(tmp_path):
    """Flat-npy format: hardlinked multi-slot saves and non-native dtypes
    (bfloat16 leaves via the manifest bitcast) round-trip exactly."""
    from kindergarten_vq_vae_tpu.ckpt.checkpoint import save_checkpoint_multi

    tree = {
        "w": jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)),
                         jnp.bfloat16),
        "nested": {"b": jnp.arange(5, dtype=jnp.int32)},
        "count": jnp.asarray(7, jnp.int32),
    }
    paths = [str(tmp_path / "slot_a"), str(tmp_path / "slot_b")]
    save_checkpoint_multi(paths, tree)
    for p in paths:
        restored = restore_checkpoint(p, tree)
        assert restored["w"].dtype == np.asarray(tree["w"]).dtype
        np.testing.assert_array_equal(np.asarray(restored["w"]),
                                      np.asarray(tree["w"]))
        np.testing.assert_array_equal(np.asarray(restored["nested"]["b"]),
                                      np.asarray(tree["nested"]["b"]))
        assert int(np.asarray(restored["count"])) == 7
    # clone slot shares inodes with the real write (hardlinks, not copies)
    a = os.stat(os.path.join(paths[0], "0.npy")).st_ino
    b = os.stat(os.path.join(paths[1], "0.npy")).st_ino
    assert a == b


def test_checkpoint_cadence_batches_writes(tiny_splits, tmp_path):
    """ckpt_every_n_epochs > 1: no best-slot dirs before the cadence epoch,
    all owed slots flushed at it (and at the final epoch)."""
    import dataclasses

    cfg = dataclasses.replace(
        _tiny_cfg("bagon"), n_epochs=2, export_checkpoint=True,
        ckpt_every_n_epochs=2, runs_dir=str(tmp_path),
    )
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    eng = Engine(cfg, tiny_splits, run_path=run_dir)
    eng.fit(console_print=False)
    names = sorted(os.listdir(eng.run_path))
    # epoch 1 improves everything but writes nothing; epoch 2 flushes
    assert any(n.startswith("bagon_ckpt_loss_recon_val") for n in names)
    assert any(n.startswith("bagon_ckpt_metric_acc_train") for n in names)
    assert not eng._ckpt_owed


def test_async_checkpoint_writer(tmp_path):
    """AsyncCheckpointWriter: durable after wait(), hardlinked clones,
    newest-wins supersede per destination group, background errors
    re-raised on wait()."""
    import threading

    from kindergarten_vq_vae_tpu.ckpt.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    meta_seen = []
    tree_a = {"x": jnp.arange(4, dtype=jnp.float32)}
    tree_b = {"x": jnp.arange(4, dtype=jnp.float32) + 100.0}
    dst = str(tmp_path / "slot")
    clone = str(tmp_path / "clone")
    # two submits to the same group before the worker can possibly finish
    # both: the final on-disk state must be the NEWEST bundle
    w.save_multi([dst, clone], tree_a)
    w.save_multi([dst, clone], tree_b, after=lambda: meta_seen.append(1))
    w.wait()
    got = restore_checkpoint(dst, tree_b)
    np.testing.assert_array_equal(np.asarray(got["x"]), np.asarray(tree_b["x"]))
    assert os.stat(os.path.join(dst, "0.npy")).st_ino == os.stat(
        os.path.join(clone, "0.npy")).st_ino
    assert meta_seen == [1]  # `after` ran once the bundle was durable

    # a failing write surfaces on wait(), and the writer stays usable
    def boom():
        raise OSError("disk full")

    w._submit("bad-group", boom)
    try:
        w.wait()
        raise AssertionError("expected RuntimeError from failed write")
    except RuntimeError:
        pass
    w.save(str(tmp_path / "again"), tree_a)
    w.wait()
    assert os.path.exists(os.path.join(str(tmp_path / "again"), "0.npy"))
    assert threading.active_count() >= 1


def test_shelgon3_decoder_corruption():
    """Opt-in shelgon3 decoder-input corruption (decoder_perturb_train_pct):
    the reference's shelgon3 feeds the SAME ids to encoder and decoder
    (Shelgon.py:50-71, no perturbator) — measured at bert-base to let the
    teacher-forced copy path re-collapse codebook perplexity to 1.0 when
    the decoder trains (RESULTS.md stage 4). The corrupted path must change
    the decoder input while keeping the CLEAN ids as the recon target."""
    from kindergarten_vq_vae_tpu.train.variants import make_loss_fn

    cfg = _tiny_cfg("shelgon3")
    flat = cfg.get_config()
    flat["decoder_perturb_train_pct"] = 0.9
    cfg = RunConfig.from_flat_dict(flat)

    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (8, 12)), jnp.int32),
        "attention_mask": jnp.ones((8, 12), jnp.int32),
        "n_valid": jnp.int32(8),
    }
    rngs = {"dropout": jax.random.key(1), "gumbel": jax.random.key(2),
            "perturb": jax.random.key(3)}

    lt, auxt = make_loss_fn(cfg, "train")(params, batch, rngs, True)
    lv, auxv = make_loss_fn(cfg, "val")(params, batch, rngs, True)
    # val has no corruption (decoder_perturb_val_pct=0): same clean forward
    assert np.isfinite(float(lt)) and np.isfinite(float(lv))
    # 90% of decoder inputs replaced -> the recon loss must move
    assert abs(float(lt) - float(lv)) > 1e-6
    # denoising: the target stays the CLEAN ids under corruption
    np.testing.assert_array_equal(
        np.asarray(auxt["target_ids"]), np.asarray(batch["input_ids"]))
