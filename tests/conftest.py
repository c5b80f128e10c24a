"""Test configuration: force an 8-device virtual CPU backend.

Multi-chip hardware is not available in CI; the standard JAX trick
(XLA_FLAGS=--xla_force_host_platform_device_count=8) gives 8 fake CPU
devices so sharding/pjit paths are exercised for real (SURVEY §4).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-register a TPU backend via sitecustomize and pin
# jax_platforms to it; override before any backend initialization so the
# suite runs on the 8-device virtual CPU mesh regardless.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_corpus():
    """Small generated corpus + prepared artifacts, shared across tests."""
    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences
    from kindergarten_vq_vae_tpu.data import prepare

    sentences, labels = generate_dsentences(num_verbs=2, num_objects=2)
    one_hot = prepare.labels_to_one_hot(labels)
    sentences_c, labels_c, one_hot_c, kept = prepare.clean_dataset(sentences, labels, one_hot)
    vocab = prepare.export_vocab(sentences_c)
    from kindergarten_vq_vae_tpu.data.tokenizer import WordTokenizer

    tok = WordTokenizer(vocab)
    max_len = prepare.find_max_encoded_length(sentences_c, tok)
    ids, mask = prepare.tokenize_corpus(sentences_c, tok, max_len)
    return {
        "sentences": sentences,
        "labels": labels,
        "sentences_clean": sentences_c,
        "labels_clean": labels_c,
        "one_hot_clean": one_hot_c,
        "one_hot_full": one_hot,
        "kept": kept,
        "labels8_clean": labels[kept][:, 1:],
        "one_hot8_clean": one_hot[kept],
        "vocab": vocab,
        "tokenizer": tok,
        "max_length": max_len,
        "input_ids": ids,
        "attention_mask": mask,
    }
