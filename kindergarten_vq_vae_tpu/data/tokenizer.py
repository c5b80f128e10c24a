"""Self-contained tokenizers (no network, no HF runtime dependency).

The reference leans on HF ``BertTokenizerFast`` downloaded from the hub
(models/bagon/main.py:65-73). This framework is hermetic:

- ``WordTokenizer``: BERT-style special tokens + word-level vocab built from
  the corpus. dSentences is a closed, tiny vocabulary, so word-level ids are
  lossless and the natural TPU-first choice (fixed tiny vocab, no subword
  alignment pass needed by the disentanglement analysis).
- ``WordPieceTokenizer``: greedy longest-match-first WordPiece, compatible
  with a ``vocab.txt`` in the BERT format (one token per line, ``##``
  continuation prefix). Used when a real BERT vocabulary file is available
  locally, for exact HF-id parity.

Both expose the same interface: ``encode``, ``encode_word``, ``decode``,
``batch_decode``, ``vocab_size``, and BERT special-token ids.
"""

from __future__ import annotations

import json

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
_SPECIALS = (PAD, UNK, CLS, SEP, MASK)


class _BaseTokenizer:
    vocab: dict[str, int]
    inv_vocab: dict[int, str]

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @property
    def pad_token_id(self) -> int:
        return self.vocab[PAD]

    @property
    def unk_token_id(self) -> int:
        return self.vocab[UNK]

    @property
    def cls_token_id(self) -> int:
        return self.vocab[CLS]

    @property
    def sep_token_id(self) -> int:
        return self.vocab[SEP]

    def _encode_words(self, words: list[str]) -> list[int]:
        raise NotImplementedError

    def encode(self, sentence: str, add_special_tokens: bool = True) -> list[int]:
        ids = self._encode_words(sentence.strip().lower().split())
        if add_special_tokens:
            return [self.cls_token_id] + ids + [self.sep_token_id]
        return ids

    def encode_word(self, word: str) -> list[int]:
        """Ids for a single word, no specials (the word<->token alignment
        contract of dSentences_word_to_hf_token_id.py:41-64)."""
        return self._encode_words([word.lower()])

    def encode_batch(self, sentences: list[str], max_length: int, add_special_tokens: bool = True):
        import numpy as np

        ids = np.zeros((len(sentences), max_length), dtype=np.int32)
        mask = np.zeros((len(sentences), max_length), dtype=np.int32)
        for i, s in enumerate(sentences):
            enc = self.encode(s, add_special_tokens)[:max_length]
            ids[i, : len(enc)] = enc
            mask[i, : len(enc)] = 1
        return ids, mask

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        special_ids = {self.vocab[s] for s in _SPECIALS if s in self.vocab}
        toks = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in special_ids:
                continue
            tok = self.inv_vocab.get(i, UNK)
            if tok.startswith("##") and toks:
                toks[-1] += tok[2:]
            else:
                toks.append(tok)
        return " ".join(toks)

    def batch_decode(self, batch_ids, skip_special_tokens: bool = True) -> list[str]:
        return [self.decode(row, skip_special_tokens) for row in batch_ids]

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"type": type(self).__name__, "vocab": self.vocab}, f)

    @staticmethod
    def load(path: str):
        with open(path) as f:
            obj = json.load(f)
        cls = {"WordTokenizer": WordTokenizer, "WordPieceTokenizer": WordPieceTokenizer}[obj["type"]]
        tok = cls.__new__(cls)
        tok.vocab = {k: int(v) for k, v in obj["vocab"].items()}
        tok.inv_vocab = {v: k for k, v in tok.vocab.items()}
        return tok


class WordTokenizer(_BaseTokenizer):
    """Word-level tokenizer over a closed corpus vocabulary."""

    def __init__(self, words: list[str]):
        self.vocab = {s: i for i, s in enumerate(_SPECIALS)}
        for w in words:
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}

    def _encode_words(self, words: list[str]) -> list[int]:
        unk = self.unk_token_id
        return [self.vocab.get(w, unk) for w in words]


class WordPieceTokenizer(_BaseTokenizer):
    """Greedy longest-match-first WordPiece (BERT algorithm, uncased)."""

    def __init__(self, vocab_tokens: list[str], max_chars_per_word: int = 100):
        self.vocab = {t: i for i, t in enumerate(vocab_tokens)}
        for s in _SPECIALS:
            if s not in self.vocab:
                self.vocab[s] = len(self.vocab)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        self.max_chars_per_word = max_chars_per_word

    @classmethod
    def from_vocab_file(cls, path: str) -> "WordPieceTokenizer":
        with open(path) as f:
            tokens = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        return cls(tokens)

    def _wordpiece(self, word: str) -> list[int]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token_id]
        pieces: list[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_token_id]
            pieces.append(cur)
            start = end
        return pieces

    def _encode_words(self, words: list[str]) -> list[int]:
        out: list[int] = []
        for w in words:
            out.extend(self._wordpiece(w))
        return out


def _bytes_to_unicode():
    """GPT-2's reversible byte<->unicode map (printable surrogates for
    control bytes; 'Ġ' is the space marker)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class BPETokenizer:
    """GPT-2-style byte-level BPE, loading ``vocab.json`` + ``merges.txt``
    (the reference's GPT-2 decoder tokenizer path, models/bagon/main.py:69-73,
    including pad = eos). Self-contained: no HF runtime, no network."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 eos_token: str = "<|endoftext|>"):
        self.vocab = dict(vocab)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.eos_token = eos_token
        self._cache: dict[str, list[str]] = {}

    @classmethod
    def from_files(cls, vocab_json_path: str, merges_path: str) -> "BPETokenizer":
        import json as _json

        with open(vocab_json_path) as f:
            vocab = _json.load(f)
        merges = []
        with open(merges_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        return cls(vocab, merges)

    @classmethod
    def train(cls, texts: list[str], vocab_size: int = 512,
              eos_token: str = "<|endoftext|>") -> "BPETokenizer":
        """Learn byte-level BPE merges from a corpus (hermetic GPT-2 decoder
        configs need no shipped vocab files — ref models/bagon/main.py:69-73
        downloads the GPT-2 tokenizer from the hub instead).

        Standard BPE: start from the 256 byte-unicode symbols, repeatedly
        merge the most frequent adjacent pair (frequency-weighted over unique
        pretokenized words; GPT-2's leading-space marker included)."""
        from collections import Counter

        byte_encoder = _bytes_to_unicode()
        base = [byte_encoder[b] for b in range(256)]
        vocab = {t: i for i, t in enumerate(base)}

        # pretokenize: word frequencies, with the non-initial leading space
        words: Counter = Counter()
        for text in texts:
            for i, w in enumerate(str(text).strip().split()):
                chunk = (" " + w) if i > 0 else w
                words["".join(byte_encoder[b] for b in chunk.encode("utf-8"))] += 1

        splits = {w: list(w) for w in words}
        merges: list[tuple[str, str]] = []
        target_merges = max(0, vocab_size - len(vocab) - 1)  # -1 for eos
        for _ in range(target_merges):
            pair_counts: Counter = Counter()
            for w, freq in words.items():
                sym = splits[w]
                for j in range(len(sym) - 1):
                    pair_counts[(sym[j], sym[j + 1])] += freq
            if not pair_counts:
                break
            # deterministic tie-break: count desc, then lexicographic
            best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
            if pair_counts[best] < 2:
                break
            merges.append(best)
            vocab[best[0] + best[1]] = len(vocab)
            a, b = best
            for w in words:
                sym = splits[w]
                j, merged = 0, []
                while j < len(sym):
                    if j < len(sym) - 1 and sym[j] == a and sym[j + 1] == b:
                        merged.append(a + b)
                        j += 2
                    else:
                        merged.append(sym[j])
                        j += 1
                splits[w] = merged
        vocab[eos_token] = len(vocab)
        return cls(vocab, merges, eos_token=eos_token)

    def save(self, vocab_json_path: str, merges_path: str) -> None:
        import json as _json

        with open(vocab_json_path, "w") as f:
            _json.dump(self.vocab, f)
        with open(merges_path, "w") as f:
            f.write("#version: 0.2\n")
            for a, b in sorted(self.bpe_ranks, key=self.bpe_ranks.get):
                f.write(f"{a} {b}\n")

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @property
    def eos_token_id(self) -> int:
        return self.vocab[self.eos_token]

    @property
    def pad_token_id(self) -> int:
        # GPT-2 has no pad token; the reference sets pad = eos (main.py:71)
        return self.eos_token_id

    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            merged, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        # whitespace pretokenization with the leading-space marker, matching
        # GPT-2's regex for plain word text
        ids: list[int] = []
        for i, word in enumerate(text.strip().split()):
            chunk = (" " + word) if i > 0 else word
            mapped = "".join(self.byte_encoder[b] for b in chunk.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.vocab[piece])
        return ids

    def encode_word(self, word: str) -> list[int]:
        mapped = "".join(self.byte_encoder[b] for b in (" " + word).encode("utf-8"))
        return [self.vocab[p] for p in self._bpe(mapped)]

    def encode_batch(self, sentences: list[str], max_length: int, add_special_tokens: bool = False):
        import numpy as np

        pad = self.pad_token_id
        ids = np.full((len(sentences), max_length), pad, dtype=np.int32)
        mask = np.zeros((len(sentences), max_length), dtype=np.int32)
        for i, s in enumerate(sentences):
            enc = self.encode(s)[:max_length]
            ids[i, : len(enc)] = enc
            mask[i, : len(enc)] = 1
        return ids, mask

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        text = "".join(self.inv_vocab.get(int(i), "") for i in ids
                       if not (skip_special_tokens and int(i) == self.eos_token_id))
        raw = bytearray(self.byte_decoder[ch] for ch in text if ch in self.byte_decoder)
        return raw.decode("utf-8", errors="replace")

    def batch_decode(self, batch_ids, skip_special_tokens: bool = True) -> list[str]:
        return [self.decode(row, skip_special_tokens) for row in batch_ids]
