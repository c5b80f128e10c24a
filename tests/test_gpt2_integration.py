"""GPT-2 decoder integration: config dispatch, engine step, freezing paths,
BPE tokenizer."""

import jax
import numpy as np
import pytest
from flax import traverse_util

from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset
from kindergarten_vq_vae_tpu.data.tokenizer import BPETokenizer
from kindergarten_vq_vae_tpu.nn.gpt2 import GPT2Config
from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
from kindergarten_vq_vae_tpu.train.engine import Engine
from kindergarten_vq_vae_tpu.train.freezing import trainable_mask
from kindergarten_vq_vae_tpu.train.variants import bert_configs, init_params


def _pad_to(arr, L):
    if arr.shape[1] >= L:
        return arr[:, :L]
    return np.pad(arr, ((0, 0), (0, L - arr.shape[1])))


def _gpt2_cfg(**kw):
    return RunConfig(
        model=ModelConfig(
            model_name="bagon",
            decoder_model_name="gpt2",
            vocab_size=128,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            compute_dtype="float32",
            **kw,
        ),
        data=DataConfig(batch_size=16, tokenized_sentence_max_length=12,
                        lim_batches_train_pct=0.05, lim_batches_val_pct=0.1,
                        lim_batches_test_pct=0.1),
        optim=OptimConfig(lr=1e-3),
        n_epochs=1,
        n_epochs_to_decode_after=10,
    )


def test_config_selects_gpt2_decoder():
    cfg = _gpt2_cfg()
    enc, dec = bert_configs(cfg)
    assert isinstance(dec, GPT2Config)
    assert dec.add_cross_attention
    # decoder vocab override plumbs through
    cfg2 = _gpt2_cfg(decoder_vocab_size=77)
    _, dec2 = bert_configs(cfg2)
    assert dec2.vocab_size == 77


def test_gpt2_decoder_trains(tiny_corpus):
    ds = DSentences(
        input_ids=_pad_to(tiny_corpus["input_ids"], 12),
        attention_mask=_pad_to(tiny_corpus["attention_mask"], 12),
        labels=tiny_corpus["labels_clean"],
        one_hot=tiny_corpus["one_hot_clean"],
        sentences=tiny_corpus["sentences_clean"],
    )
    tr, va, te = split_dataset(ds)
    cfg = _gpt2_cfg()
    eng = Engine(cfg, {"train": tr, "val": va, "test": te})
    # decoder params have the GPT-2 layout
    assert "wte" in eng.state.params["decoder"]
    history = eng.fit(console_print=False)
    assert np.isfinite(history[0]["train"]["loss_recon"])
    assert np.isfinite(history[0]["val"]["loss_recon"])


def test_freezing_gpt2_paths():
    cfg = _gpt2_cfg()
    params = init_params(cfg, jax.random.key(0))
    dec_ft = traverse_util.flatten_dict(
        trainable_mask(params, "dec-head-ft", cross_attn_trainable=True)
    )
    # lm_head tied -> wte trainable (Bagon.py:110 with tied weights)
    assert dec_ft[("decoder", "wte", "embedding")]
    # cross-attn + ln_cross_attn trainable (Bagon.py:120-124)
    assert dec_ft[("decoder", "layer_0", "q_attn", "kernel")]
    assert dec_ft[("decoder", "layer_0", "crossattention_c_attn", "kernel")]
    assert dec_ft[("decoder", "layer_0", "ln_cross_attn", "scale")]
    # self-attn frozen
    assert not dec_ft[("decoder", "layer_0", "c_attn", "kernel")]
    no_ca = traverse_util.flatten_dict(
        trainable_mask(params, "dec-head-ft", cross_attn_trainable=False)
    )
    assert not no_ca[("decoder", "layer_0", "q_attn", "kernel")]


def test_bpe_tokenizer_merges_and_roundtrip():
    # tiny handcrafted byte-level BPE: merge e+a -> ea, t+he -> ...
    from kindergarten_vq_vae_tpu.data.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    sp = b2u[ord(" ")]  # 'Ġ'
    base_tokens = [b2u[b] for b in range(256)]
    merges = [("e", "a"), (sp, "ea"), (f"{sp}ea", "t"), ("ea", "t")]
    vocab = {t: i for i, t in enumerate(base_tokens)}
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab.setdefault("<|endoftext|>", len(vocab))
    tok = BPETokenizer(vocab, merges)

    ids = tok.encode("eat eat")
    assert ids[0] == vocab["eat"]
    assert ids[1] == vocab[f"{sp}eat"]
    assert tok.decode(ids) == "eat eat"
    assert tok.pad_token_id == tok.eos_token_id  # pad = eos (main.py:71)

    arr, mask = tok.encode_batch(["eat", "eat eat"], max_length=4)
    assert arr.shape == (2, 4)
    assert mask[0].sum() == 1 and mask[1].sum() == 2
    assert arr[0, 1] == tok.pad_token_id


def test_dual_tokenizer_batches(tiny_corpus):
    ids = _pad_to(tiny_corpus["input_ids"], 12)
    mask = _pad_to(tiny_corpus["attention_mask"], 12)
    ds = DSentences(
        input_ids=ids, attention_mask=mask,
        dec_input_ids=ids + 1, dec_attention_mask=mask,
    )
    from kindergarten_vq_vae_tpu.data.dataset import BatchIterator

    b = next(iter(BatchIterator(ds, 8)))
    assert "dec_input_ids" in b
    np.testing.assert_array_equal(b["dec_input_ids"], b["input_ids"] + 1)


def test_bpe_trainer_roundtrip(tiny_corpus, tmp_path):
    """Learn BPE merges from the corpus (no external vocab files): train ->
    encode -> decode roundtrip, save/load stability, and compression (merges
    actually shorten common words)."""
    texts = [str(s) for s in tiny_corpus["sentences_clean"]]
    tok = BPETokenizer.train(texts, vocab_size=400)
    assert tok.vocab_size <= 400
    assert len(tok.bpe_ranks) > 10, "expected learned merges on a real corpus"

    for s in texts[:50]:
        ids = tok.encode(s)
        assert tok.decode(ids) == " ".join(s.strip().split())
    # merges compress: a common long word uses fewer tokens than its bytes
    w = max(texts[0].split(), key=len)
    assert len(tok.encode_word(w)) < len(w)

    vp, mp = str(tmp_path / "v.json"), str(tmp_path / "m.txt")
    tok.save(vp, mp)
    tok2 = BPETokenizer.from_files(vp, mp)
    for s in texts[:10]:
        assert tok.encode(s) == tok2.encode(s)


def test_gpt2_variant_e2e_hermetic(tiny_corpus, tmp_path):
    """GPT-2 decoder end-to-end WITHOUT external vocab files: load_data trains
    the BPE tokenizer from the corpus, emits dec_* columns, and one bagon
    train step over the dual-tokenized batch is finite."""
    import dataclasses
    import os

    import jax

    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences
    from kindergarten_vq_vae_tpu.data.prepare import prepare_all
    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.run import load_data
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn
    from kindergarten_vq_vae_tpu.data.dataset import BatchIterator

    raw = str(tmp_path / "data")
    os.makedirs(raw, exist_ok=True)
    generate_dsentences(raw, num_verbs=2, num_objects=2)
    prepare_all(raw, max_length=12)

    cfg = RunConfig(
        model=ModelConfig(
            model_name="bagon", decoder_model_name="gpt2", vocab_size=128,
            decoder_vocab_size=300, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, compute_dtype="float32",
        ),
        data=DataConfig(data_dir=raw, batch_size=8, tokenized_sentence_max_length=12),
        optim=OptimConfig(lr=1e-3),
    )
    # vocab_size must cover the word tokenizer's ids
    import numpy as _np

    ids = _np.load(os.path.join(raw, "dSentences_input_ids.npy"))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, vocab_size=int(ids.max()) + 1)
    )
    splits, tok = load_data(cfg)
    assert os.path.exists(os.path.join(raw, "gpt2_vocab.json")), "trained BPE must be persisted"
    tr = splits["train"]
    assert tr.dec_input_ids is not None and tr.dec_input_ids.shape[1] == 12

    batch = next(iter(BatchIterator(tr, 8)))
    params = init_params(cfg, jax.random.key(0))
    loss_fn = make_loss_fn(cfg, "train")
    rngs = {"dropout": jax.random.key(1), "gumbel": jax.random.key(2), "perturb": jax.random.key(3)}
    import jax.numpy as jnp

    device_batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "index"}
    loss, aux = loss_fn(params, device_batch, rngs, True)
    assert np.isfinite(float(loss))
