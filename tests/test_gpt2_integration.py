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
