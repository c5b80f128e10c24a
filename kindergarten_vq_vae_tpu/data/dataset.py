"""Packed, pre-tokenized dataset + deterministic splits + batch iterator.

TPU-first redesign of the reference L1 layer
(datasets/dSentences/dSentencesDataset.py): instead of yielding raw python
strings that get tokenized inside the hot loop (the reference's main
bottleneck, models/bagon/Trainer.py:79-83), the dataset holds fixed-shape
int32 arrays produced offline by data/prepare.py. Batches are numpy slices
with static shapes; the last partial batch is padded and carries ``n_valid``
so statistics are weighted by true element counts (this also fixes the
reference's ``n_els_batch = len(batch)`` bug, SURVEY §2.9.2).

Split semantics: 60/20/20 by a permutation keyed on seed 69
(models/bagon/main.py:43-48). Matching torch's ``randperm`` bit pattern is a
non-goal (SURVEY §7.1); same-seed determinism within this pipeline is the
contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from kindergarten_vq_vae_tpu.utils.consts import DS_GEN_SEED


class _LazyRows:
    """Row-indirected view of a column: composes an index array over a base
    array (often an np.memmap) so splits never materialize their selection.
    ``col[idx]`` reads only the touched rows from disk; ``np.asarray(col)``
    materializes explicitly."""

    def __init__(self, base, idx: np.ndarray):
        self.base, self.idx = base, idx

    def __len__(self) -> int:
        return len(self.idx)

    @property
    def shape(self):
        return (len(self.idx),) + tuple(np.shape(self.base)[1:])

    @property
    def dtype(self):
        return self.base.dtype

    def __getitem__(self, key):
        return self.base[self.idx[key]]

    def __array__(self, dtype=None, copy=None):
        out = self.base[self.idx]
        return np.asarray(out, dtype=dtype)


@dataclass
class DSentences:
    """Column store for the tokenized corpus.

    - ``input_ids`` (N, L) int32, ``attention_mask`` (N, L) int32
    - ``labels`` (N, 5) clean factor labels (dSentencesDataset.py:62)
    - ``one_hot`` (N, 5, 3) clean one-hots (dSentencesDataset.py:63)
    - ``labels8`` / ``one_hot8`` optional 8-factor variants for Shelgon2
    - ``sentences`` optional raw strings (for decode dumps / analyses)
    """

    input_ids: np.ndarray
    attention_mask: np.ndarray
    # optional decoder-side tokenization (dual-tokenizer configs, e.g. a
    # GPT-2 decoder: ref models/bagon/main.py:65-73 tokenizes twice)
    dec_input_ids: np.ndarray | None = None
    dec_attention_mask: np.ndarray | None = None
    labels: np.ndarray | None = None
    one_hot: np.ndarray | None = None
    labels8: np.ndarray | None = None
    one_hot8: np.ndarray | None = None
    sentences: list[str] | None = None

    def __post_init__(self):
        n = len(self.input_ids)
        for name in ("attention_mask", "dec_input_ids", "dec_attention_mask", "labels", "one_hot", "labels8", "one_hot8"):
            arr = getattr(self, name)
            if arr is not None and len(arr) != n:
                raise AssertionError(
                    f"Provided {n} sentences but {len(arr)} rows of {name}; "
                    "please provide one row per sentence!"
                )

    def __len__(self) -> int:
        return len(self.input_ids)

    def select(self, idx: np.ndarray, lazy: bool | None = None) -> "DSentences":
        """Row subset. ``lazy=None`` auto-detects: memory-mapped (or already
        lazy) columns keep index indirection end-to-end (corpora >> RAM never
        materialize, NEXT.md #6); in-RAM columns copy as before."""
        if lazy is None:
            lazy = isinstance(self.input_ids, (np.memmap, _LazyRows))

        def sel(col):
            if col is None:
                return None
            if lazy and isinstance(col, _LazyRows):
                return _LazyRows(col.base, col.idx[idx])
            if lazy and isinstance(col, np.ndarray):
                return _LazyRows(col, np.asarray(idx))
            return col[idx]

        return DSentences(
            input_ids=sel(self.input_ids),
            attention_mask=sel(self.attention_mask),
            dec_input_ids=sel(self.dec_input_ids),
            dec_attention_mask=sel(self.dec_attention_mask),
            labels=sel(self.labels),
            one_hot=sel(self.one_hot),
            labels8=sel(self.labels8),
            one_hot8=sel(self.one_hot8),
            sentences=None
            if self.sentences is None
            else [self.sentences[i] for i in idx],
        )

    @classmethod
    def from_artifacts(cls, artifacts: dict) -> "DSentences":
        """Build from data/prepare.py ``prepare_all`` output (including the
        8-factor arrays aligned to the clean sentence set for Shelgon2)."""
        return cls(
            input_ids=artifacts["input_ids"],
            attention_mask=artifacts["attention_mask"],
            labels=artifacts["latent_classes_labels_clean"],
            one_hot=artifacts["latent_classes_one_hot_clean"],
            labels8=artifacts.get("latent_classes_labels8_clean"),
            one_hot8=artifacts.get("latent_classes_one_hot8_clean"),
            sentences=artifacts["sentences_clean"],
        )


def split_dataset(
    ds: DSentences,
    train_pct: float = 0.6,
    val_pct: float = 0.2,
    seed: int = DS_GEN_SEED,
):
    """Deterministic train/val/test split (main.py:43-48 semantics)."""
    n = len(ds)
    n_train = int(n * train_pct)
    n_val = int(n * val_pct)
    perm = np.random.default_rng(seed).permutation(n)
    return (
        ds.select(perm[:n_train]),
        ds.select(perm[n_train : n_train + n_val]),
        ds.select(perm[n_train + n_val :]),
    )


@dataclass
class BatchIterator:
    """Static-shape batch iterator.

    Yields dicts of numpy arrays with a fixed leading dim ``batch_size``;
    partial final batches are padded (repeating row 0) and report the true
    count in ``n_valid``. ``lim_batches_pct`` matches the reference's
    ``LIM_BATCHES_*_PCT`` (models/bagon/main.py:122-123) but without the
    ``list(dl)`` materialization bug (SURVEY §2.9.3).
    """

    ds: DSentences
    batch_size: int
    shuffle: bool = False
    seed: int = 0
    lim_batches_pct: float = 1.0
    drop_last: bool = False
    # multi-host data parallelism: every process computes the SAME global
    # permutation (seeded) and loads only its contiguous slice of each
    # global batch; parallel.mesh.shard_batch assembles the global array
    # from the per-process slices. batch_size stays the GLOBAL batch size.
    process_index: int = 0
    process_count: int = 1
    _epoch: int = field(default=0, init=False)

    def __len__(self) -> int:
        n = len(self.ds)
        total = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        if self.lim_batches_pct < 1.0 and total > 0:
            # floor, but never to zero: a tiny pct on a small split must
            # still run one batch (int(total*pct)==0 used to starve the
            # epoch and crash the stats divide in the engine)
            return max(1, int(total * self.lim_batches_pct))
        return total

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __iter__(self):
        n = len(self.ds)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self._epoch)).permutation(n)
        else:
            order = np.arange(n)
        n_batches = len(self)
        bs = self.batch_size
        for b in range(n_batches):
            idx = order[b * bs : (b + 1) * bs]
            n_valid = len(idx)
            if n_valid < bs:
                idx = np.concatenate([idx, np.full(bs - n_valid, idx[0] if n_valid else 0)])
            if self.process_count > 1:
                # this process's contiguous shard of the global batch
                if bs % self.process_count:
                    raise ValueError(
                        f"batch_size {bs} must divide process_count {self.process_count}"
                    )
                local = bs // self.process_count
                idx = idx[self.process_index * local : (self.process_index + 1) * local]
            batch = {
                "input_ids": self.ds.input_ids[idx],
                "attention_mask": self.ds.attention_mask[idx],
                "n_valid": np.int32(n_valid),
                "index": idx,
            }
            if self.ds.dec_input_ids is not None:
                batch["dec_input_ids"] = self.ds.dec_input_ids[idx]
                batch["dec_attention_mask"] = self.ds.dec_attention_mask[idx]
            if self.ds.labels is not None:
                batch["labels"] = self.ds.labels[idx]
            if self.ds.one_hot is not None:
                batch["one_hot"] = self.ds.one_hot[idx]
            if self.ds.labels8 is not None:
                batch["labels8"] = self.ds.labels8[idx]
            if self.ds.one_hot8 is not None:
                batch["one_hot8"] = self.ds.one_hot8[idx]
            yield batch
