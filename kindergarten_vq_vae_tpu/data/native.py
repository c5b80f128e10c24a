"""ctypes bridge to the native C++ corpus tokenizer (native/corpus_tokenizer.cpp).

Compiles on first use with g++ (cached next to the source); every entry
point degrades gracefully to the pure-python path in data/prepare.py when a
toolchain or the library is unavailable, so the framework stays hermetic.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "corpus_tokenizer.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libcorpus_tokenizer.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.abspath(_SRC)
    lib_path = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return None
    try:
        if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, "-o", lib_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.tokenize_corpus.restype = ctypes.c_int
        lib.tokenize_corpus.argtypes = [
            ctypes.c_char_p,                    # text
            ctypes.POINTER(ctypes.c_long),      # offsets
            ctypes.c_long,                      # n_sentences
            ctypes.c_char_p,                    # vocab blob
            ctypes.c_long,                      # vocab blob len
            ctypes.c_long,                      # n_vocab
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # unk/cls/sep
            ctypes.c_int,                       # word_level
            ctypes.c_int,                       # add_special
            ctypes.c_int,                       # max_len
            ctypes.c_int,                       # n_threads
            ctypes.POINTER(ctypes.c_int),       # out ids
            ctypes.POINTER(ctypes.c_int),       # out mask
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def tokenize_corpus_native(
    sentences: list[str],
    tokenizer,
    max_length: int,
    add_special_tokens: bool = True,
    n_threads: int | None = None,
):
    """Native replacement for data/prepare.py:tokenize_corpus.

    Supports WordTokenizer (word-level lookup) and WordPieceTokenizer
    (greedy longest-match). Returns None if the native path is unavailable
    or the tokenizer type is unsupported — callers fall back to python.
    """
    from kindergarten_vq_vae_tpu.data.tokenizer import WordPieceTokenizer, WordTokenizer

    lib = _load()
    if lib is None or not isinstance(tokenizer, (WordTokenizer, WordPieceTokenizer)):
        return None

    n = len(sentences)
    lowered = [s.strip().lower() for s in sentences]
    text = "".join(lowered).encode("utf-8")
    offsets = np.zeros(n + 1, np.int64)
    pos = 0
    for i, s in enumerate(lowered):
        offsets[i + 1] = pos = pos + len(s.encode("utf-8"))

    # vocab blob: id = index order
    inv = tokenizer.inv_vocab
    tokens = [inv[i] for i in range(tokenizer.vocab_size)]
    vocab_blob = b"\0".join(t.encode("utf-8") for t in tokens) + b"\0"

    out_ids = np.zeros((n, max_length), np.int32)
    out_mask = np.zeros((n, max_length), np.int32)
    rc = lib.tokenize_corpus(
        text,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n,
        vocab_blob,
        len(vocab_blob),
        tokenizer.vocab_size,
        tokenizer.unk_token_id,
        tokenizer.cls_token_id,
        tokenizer.sep_token_id,
        1 if isinstance(tokenizer, WordTokenizer) else 0,
        1 if add_special_tokens else 0,
        max_length,
        n_threads or os.cpu_count() or 1,
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        return None
    return out_ids, out_mask
