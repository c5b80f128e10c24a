"""Offline preprocessing pipeline.

One module replaces the reference's five one-shot scripts (SURVEY §2.1), with
the same artifact semantics, exposed both as library functions and a single
CLI (``python -m kindergarten_vq_vae_tpu.data.prepare``):

- ``clean_dataset``          ref datasets/dSentences/dSentences_clean_dataset.py:27-54
- ``labels_to_one_hot``      ref dSentences_labels_to_one_hot.py:13-27
- ``export_vocab``           ref dSentences_export_vocab.py:24-42
- ``word_to_token_id_map``   ref dSentences_word_to_hf_token_id.py:41-64
- ``find_max_encoded_length``ref dSentences_find_max_encoded_length.py:49-57
- ``tokenize_corpus``        NEW: the TPU-first addition — tokenize once,
                             offline, into static-shape int32 arrays so the
                             training hot loop never touches a tokenizer
                             (the reference tokenizes per step on CPU,
                             models/bagon/Trainer.py:79-83 — its main
                             bottleneck).
"""

from __future__ import annotations

import json
import os

import numpy as np

from kindergarten_vq_vae_tpu.utils.consts import CLEAN_FACTOR_COLUMNS, FACTOR_MAX_SUPPORT


def clean_dataset(sentences: list[str], labels: np.ndarray, one_hot: np.ndarray):
    """Dedup sentences; select clean label columns [2,5,6,7,8].

    Parity with dSentences_clean_dataset.py:27-39, including its quirk of
    prepending a [-1,-1,-1] row to the (8,3) one-hot before selecting rows
    [2,5,6,7,8] (so row 0 of the padded (9,3) array is a sentinel and the
    selected rows line up with raw factor indices).
    """
    seen: set[str] = set()
    sentences_clean: list[str] = []
    labels_clean: list[np.ndarray] = []
    one_hot_clean: list[np.ndarray] = []
    kept_indices: list[int] = []
    sentinel = np.asarray([[-1] * FACTOR_MAX_SUPPORT])
    cols = list(CLEAN_FACTOR_COLUMNS)
    for i, (s, lab, oh) in enumerate(zip(sentences, labels, one_hot)):
        if s in seen:
            continue
        seen.add(s)
        kept_indices.append(i)
        sentences_clean.append(s)
        labels_clean.append(lab[cols])
        padded = np.concatenate((sentinel, oh), axis=0)
        one_hot_clean.append(padded[cols, :])
    return (
        sentences_clean,
        np.asarray(labels_clean),
        np.asarray(one_hot_clean),
        np.asarray(kept_indices),
    )


def labels_to_one_hot(labels: np.ndarray) -> np.ndarray:
    """(N, 9) raw labels -> (N, 8, 3) one-hot, dropping raw factor 0.

    Parity with dSentences_labels_to_one_hot.py:13-27.
    """
    kept = labels[:, 1:]
    n, f = kept.shape
    out = np.zeros((n, f, FACTOR_MAX_SUPPORT), dtype=np.int64)
    rows = np.arange(n)[:, None]
    factors = np.arange(f)[None, :]
    out[rows, factors, kept] = 1
    return out


def export_vocab(sentences: list[str]) -> list[str]:
    """Whitespace-split word vocabulary, sorted (ref dSentences_export_vocab.py:24-42)."""
    vocab: set[str] = set()
    for s in sentences:
        vocab.update(s.split(" "))
    return sorted(vocab)


def word_to_token_id_map(vocab: list[str], tokenizer) -> dict:
    """word -> list of token ids under ``tokenizer`` (no special tokens).

    Parity with dSentences_word_to_hf_token_id.py:41-64: the reference
    tokenizes each vocab word with the HF BERT tokenizer to build
    word<->token-id dicts used by the disentanglement analysis alignment.
    """
    word2ids = {w: tokenizer.encode_word(w) for w in vocab}
    id2word: dict[int, list[str]] = {}
    for w, ids in word2ids.items():
        for i in ids:
            id2word.setdefault(int(i), []).append(w)
    return {"word_to_token_ids": word2ids, "token_id_to_words": id2word}


def find_max_encoded_length(sentences: list[str], tokenizer, add_special_tokens: bool = True) -> int:
    """Max tokenized length over the corpus (ref dSentences_find_max_encoded_length.py:49-57)."""
    return max(
        len(tokenizer.encode(s, add_special_tokens=add_special_tokens)) for s in sentences
    )


def tokenize_corpus(
    sentences: list[str],
    tokenizer,
    max_length: int,
    add_special_tokens: bool = True,
    use_native: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize the whole corpus once into (N, max_length) int32 ids + mask.

    This is the TPU-first replacement for per-step CPU tokenization
    (models/bagon/Trainer.py:79-83): static shapes, done offline. Uses the
    multithreaded C++ packer (data/native.py) when a toolchain is available,
    with bit-identical python fallback.
    """
    if use_native:
        from kindergarten_vq_vae_tpu.data.native import tokenize_corpus_native

        out = tokenize_corpus_native(sentences, tokenizer, max_length, add_special_tokens)
        if out is not None:
            return out

    n = len(sentences)
    ids = np.zeros((n, max_length), dtype=np.int32)
    mask = np.zeros((n, max_length), dtype=np.int32)
    for i, s in enumerate(sentences):
        enc = tokenizer.encode(s, add_special_tokens=add_special_tokens)[:max_length]
        ids[i, : len(enc)] = enc
        mask[i, : len(enc)] = 1
    return ids, mask


def prepare_all(
    raw_dir: str,
    out_dir: str | None = None,
    max_length: int | None = None,
    add_special_tokens: bool = True,
):
    """Run the full offline pipeline from raw artifacts.

    Reads ``dSentences_sentences.npy`` (byte strings) and
    ``dSentences_latent_classes_labels.npy`` from ``raw_dir`` — the exact raw
    schema the reference expects — and produces every downstream artifact in
    one pass. Returns a dict of arrays; writes .npy/.json/.txt when
    ``out_dir`` is set.
    """
    from kindergarten_vq_vae_tpu.data.tokenizer import WordTokenizer

    out_dir = out_dir or raw_dir
    sentences = [
        s.decode() if isinstance(s, bytes) else str(s)
        for s in np.load(os.path.join(raw_dir, "dSentences_sentences.npy"))
    ]
    labels = np.load(os.path.join(raw_dir, "dSentences_latent_classes_labels.npy"))

    one_hot = labels_to_one_hot(labels)
    sentences_c, labels_c, one_hot_c, kept = clean_dataset(sentences, labels, one_hot)
    vocab = export_vocab(sentences_c)
    tokenizer = WordTokenizer(vocab)
    max_len = max_length or find_max_encoded_length(sentences_c, tokenizer, add_special_tokens)
    ids, mask = tokenize_corpus(sentences_c, tokenizer, max_len, add_special_tokens)
    word_map = word_to_token_id_map(vocab, tokenizer)

    # 8-factor arrays aligned to the clean (deduped) sentence set, for
    # Shelgon2 (raw factor 0 dropped, dSentences_labels_to_one_hot.py:13)
    labels8_c = labels[kept][:, 1:]
    one_hot8_c = one_hot[kept]

    artifacts = {
        "sentences_clean": sentences_c,
        "latent_classes_labels_clean": labels_c,
        "latent_classes_one_hot_clean": one_hot_c,
        "latent_classes_labels8_clean": labels8_c,
        "latent_classes_one_hot8_clean": one_hot8_c,
        "latent_classes_one_hot_full": one_hot,
        "clean_indices": kept,
        "vocab": vocab,
        "input_ids": ids,
        "attention_mask": mask,
        "max_length": max_len,
        "tokenizer": tokenizer,
    }

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "dSentences_sentences_clean.npy"), np.asarray([s.encode() for s in sentences_c]))
        np.save(os.path.join(out_dir, "dSentences_latent_classes_labels_clean.npy"), labels_c)
        np.save(os.path.join(out_dir, "dSentences_latent_classes_one_hot_clean.npy"), one_hot_c)
        np.save(os.path.join(out_dir, "dSentences_latent_classes_labels8_clean.npy"), labels8_c)
        np.save(os.path.join(out_dir, "dSentences_latent_classes_one_hot8_clean.npy"), one_hot8_c)
        np.save(os.path.join(out_dir, "dSentences_latent_classes_one_hot.npy"), one_hot)
        np.save(os.path.join(out_dir, "dSentences_input_ids.npy"), ids)
        np.save(os.path.join(out_dir, "dSentences_attention_mask.npy"), mask)
        with open(os.path.join(out_dir, "dSentences_vocab.txt"), "w") as f:
            f.write("\n".join(vocab))
        with open(os.path.join(out_dir, "dSentences_word_token_map.json"), "w") as f:
            json.dump(word_map, f)
        tokenizer.save(os.path.join(out_dir, "dSentences_tokenizer.json"))

    return artifacts


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="dSentences offline preprocessing")
    p.add_argument("--raw-dir", default="./data/dSentences")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--max-length", type=int, default=None)
    p.add_argument("--generate", action="store_true", help="generate the synthetic corpus first")
    args = p.parse_args()

    if args.generate:
        from kindergarten_vq_vae_tpu.data.generate import generate_dsentences

        generate_dsentences(args.raw_dir)

    art = prepare_all(args.raw_dir, args.out_dir, args.max_length)
    print(
        f"prepared {len(art['sentences_clean'])} unique sentences, "
        f"vocab {len(art['vocab'])}, max_length {art['max_length']}"
    )
