"""Native C++ corpus tokenizer: bit-identical to the python path."""

import time

import numpy as np
import pytest

from kindergarten_vq_vae_tpu.data import prepare
from kindergarten_vq_vae_tpu.data.native import available, tokenize_corpus_native
from kindergarten_vq_vae_tpu.data.tokenizer import WordPieceTokenizer, WordTokenizer

needs_native = pytest.mark.skipif(not available(), reason="no g++ toolchain")


@needs_native
def test_native_word_level_matches_python(tiny_corpus):
    tok = tiny_corpus["tokenizer"]
    sents = tiny_corpus["sentences_clean"]
    L = tiny_corpus["max_length"]
    ids_py, mask_py = prepare.tokenize_corpus(sents, tok, L, use_native=False)
    out = tokenize_corpus_native(sents, tok, L)
    assert out is not None
    ids_n, mask_n = out
    np.testing.assert_array_equal(ids_n, ids_py)
    np.testing.assert_array_equal(mask_n, mask_py)


@needs_native
def test_native_wordpiece_matches_python():
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "eat", "##ing", "##s", "the", "apple", "he", "she", "was"]
    tok = WordPieceTokenizer(vocab)
    sents = ["he was eating the apples", "she eats the apple", "zzz unknown token"]
    ids_py, mask_py = prepare.tokenize_corpus(sents, tok, 10, use_native=False)
    out = tokenize_corpus_native(sents, tok, 10)
    assert out is not None
    ids_n, mask_n = out
    np.testing.assert_array_equal(ids_n, ids_py)
    np.testing.assert_array_equal(mask_n, mask_py)


@needs_native
def test_native_truncation_and_no_specials(tiny_corpus):
    tok = tiny_corpus["tokenizer"]
    sents = tiny_corpus["sentences_clean"][:100]
    ids_py, mask_py = prepare.tokenize_corpus(sents, tok, 4, add_special_tokens=False, use_native=False)
    ids_n, mask_n = tokenize_corpus_native(sents, tok, 4, add_special_tokens=False)
    np.testing.assert_array_equal(ids_n, ids_py)
    np.testing.assert_array_equal(mask_n, mask_py)


@needs_native
def test_native_speedup_on_large_corpus(tiny_corpus):
    tok = tiny_corpus["tokenizer"]
    sents = tiny_corpus["sentences_clean"] * 50  # ~300k sentences
    L = tiny_corpus["max_length"]
    t0 = time.perf_counter()
    ids_py, _ = prepare.tokenize_corpus(sents, tok, L, use_native=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    ids_n, _ = tokenize_corpus_native(sents, tok, L)
    t_n = time.perf_counter() - t0
    np.testing.assert_array_equal(ids_n, ids_py)
    # correctness is the hard assertion above; timing is only a smoke bound
    # (CI machines run the suite in parallel — allow generous headroom; the
    # measured speedup on an idle box is ~5x, RESULTS.md)
    assert t_n < t_py * 2.0, f"native {t_n:.3f}s vs python {t_py:.3f}s — pathological"
