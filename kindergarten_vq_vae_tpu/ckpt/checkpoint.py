"""Checkpointing with the reference's bundle semantics.

Reference contract (models/bagon/Trainer.py:279-296):
- bundles ``{model_state_dict, encoder_state_dict, decoder_state_dict}``
  — here the params tree IS the model state and encoder/decoder are its
  subtrees, so one tree carries the same information;
- best-file naming ``{model}_ckpt_{loss_recon|metric_acc|loss_vq}_{stage}_best``;
- a run dir pairs the checkpoint with ``run_conf.json``
  (analyses/latent_traversals/...py:41-55 reconstructs models from that
  pairing).

New capability beyond the reference (SURVEY §5.4: resume is an acknowledged
reference TODO): full train-state save/restore (params + optimizer state +
epoch) for crash-safe resumption.

Format: a directory of flat ``.npy`` files (one per pytree leaf, named by
manifest index) plus ``manifest.json`` mapping tree-path keys to files.
Measured on this host (1 core): orbax's StandardCheckpointer serializes a
1 GB bert-base bundle in 127-201 s and ``np.savez`` in 88 s (both burn the
core in their framing layers), while plain ``np.save`` streams at disk
speed (146-254 MB/s quiet; the same disk degrades to ~3-7 MB/s under
concurrent load, which is what ``AsyncCheckpointWriter`` exists for) —
checkpoint CPU cost dropped ~20x by writing leaves directly.
Restores transparently fall back to orbax for bundles written before the
format change. Writes are atomic (tmp dir + ``os.replace``) so a killed run
never leaves a half-written best checkpoint or resume bundle.
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np

MANIFEST = "manifest.json"

# numpy-native dtypes are saved as-is; anything else (bfloat16 & friends from
# ml_dtypes) is saved via a bit-compatible uint view recorded in the manifest.
_BITCAST = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def best_ckpt_name(model_name: str, stat: str, stage: str) -> str:
    return f"{model_name}_ckpt_{stat}_{stage}_best"


def _abs(path: str) -> str:
    return os.path.abspath(path)


def _keystr(path) -> str:
    """Stable tree-path key: dict keys / sequence indices / attr names
    joined with '/'. Flax param trees are nested dicts, so keys look like
    'encoder/layers_0/attention/wqkv'; optax states add indices/attrs."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:  # pragma: no cover - future jax key types
            parts.append(str(p))
    return "/".join(parts)


def _is_native(dt: np.dtype) -> bool:
    return dt.kind in "biufc" and dt.type is not np.void


def _fetch_leaves(tree):
    """Flatten + one bulk device->host transfer. This is the synchronous
    part of every save: it must happen before the caller's next train step,
    which may donate the very buffers being read."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    host = jax.device_get([leaf for _, leaf in leaves])
    keys = [_keystr(kpath) for kpath, _ in leaves]
    return keys, [np.asarray(a) for a in host]


def _write_leaves(path: str, keys, host) -> None:
    """Write fetched leaves as <path>/<i>.npy + manifest.json, atomically."""
    tmp = path + ".tmp-write"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    manifest = {}
    for i, (key, arr) in enumerate(zip(keys, host)):
        entry = {"file": f"{i}.npy", "dtype": str(arr.dtype),
                 "shape": list(arr.shape)}
        if not _is_native(arr.dtype):
            arr = arr.view(_BITCAST[arr.dtype.itemsize])
            entry["bitcast"] = str(arr.dtype)
        np.save(os.path.join(tmp, entry["file"]), arr, allow_pickle=False)
        manifest[key] = entry
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def _clone_dir(first: str, p: str) -> None:
    """Atomically clone an on-disk bundle dir via hardlinks (copy fallback)."""
    tmp = p + ".tmp-write"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    for name in os.listdir(first):
        src, dst = os.path.join(first, name), os.path.join(tmp, name)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
    if os.path.exists(p):
        shutil.rmtree(p)
    os.replace(tmp, p)


def _save_tree(path: str, tree) -> None:
    """Write a pytree as <path>/<i>.npy + manifest.json, atomically."""
    keys, host = _fetch_leaves(tree)
    _write_leaves(path, keys, host)


def _load_leaf(path: str, entry: dict) -> np.ndarray:
    arr = np.load(os.path.join(path, entry["file"]), allow_pickle=False)
    if "bitcast" in entry:
        import ml_dtypes  # bundled with jax

        arr = arr.view(np.dtype(getattr(ml_dtypes, entry["dtype"])))
    return arr


def _restore_tree(path: str, template=None):
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    if template is not None:
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        out = []
        for kpath, tleaf in leaves:
            key = _keystr(kpath)
            if key not in manifest:
                raise KeyError(f"checkpoint {path} has no leaf {key!r}")
            arr = _load_leaf(path, manifest[key])
            tshape = tuple(np.shape(tleaf))
            if tuple(arr.shape) != tshape:
                raise ValueError(
                    f"shape mismatch for {key!r}: checkpoint {arr.shape} "
                    f"vs template {tshape}")
            out.append(arr)
        return jax.tree_util.tree_unflatten(treedef, out)
    # no template: rebuild nested dicts from '/'-joined keys (covers Flax
    # param trees; non-dict pytrees need a template, as with orbax)
    root: dict = {}
    for key, entry in manifest.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _load_leaf(path, entry)
    return root


def _is_flat_format(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST))


def _orbax_restore(path: str, template=None):
    """Fallback reader for bundles written by the previous orbax format."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(_abs(path), abstract)
    return ckptr.restore(_abs(path))


def save_checkpoint(path: str, params) -> None:
    """Save a params tree (the model bundle) at ``path`` (a directory)."""
    _save_tree(_abs(path), params)


def save_checkpoint_multi(paths: list[str], params) -> None:
    """Save the SAME params bundle under several best-slot names: one real
    write + hardlinked clones (falls back to copies across filesystems).
    The engine uses this when several best metrics trigger in one epoch —
    the reference writes the identical state dict N times
    (models/bagon/Trainer.py:188-209)."""
    if not paths:
        return
    first = _abs(paths[0])
    _save_tree(first, params)
    for p in paths[1:]:
        _clone_dir(first, _abs(p))


class AsyncCheckpointWriter:
    """Background disk writer for checkpoint bundles.

    Motivation (measured on this host): the root disk sustains only
    ~3-7 MB/s under load, so a 1 GB bert-base best-bundle write stalls the
    training loop ~4 min and a 4 GB resume bundle >10 min — while the
    actual training epoch is ~3 s of device time. The split: the
    device->host fetch stays synchronous in ``save``/``save_multi``
    (donation safety — the next train step donates the caller's param
    buffers), but the disk write + atomic rename run on a daemon thread.

    Semantics:
    - One pending slot per destination group (keyed by the first path): a
      newer submission for the same group replaces an unstarted older one —
      the stale bundle is strictly dominated, so skipping it loses nothing.
    - Writes stay atomic (tmp dir + rename); a crash mid-write never
      corrupts an existing bundle, it only loses writes not yet flushed.
    - ``wait()`` drains the queue and re-raises the first background error;
      the engine drains at the end of ``fit()`` so downstream consumers
      (``Engine.test``'s best-checkpoint reload, pipeline stages) see
      durable files.
    """

    def __init__(self):
        import threading

        self._cond = threading.Condition()
        self._queue: dict = {}  # group key -> job; dict order = FIFO
        self._inflight = False
        self._error: BaseException | None = None
        self._thread = None

    def save_multi(self, paths: list[str], tree, after=None) -> None:
        """Queue a bundle write (+hardlink clones) for the background thread.
        ``after`` (optional, no-arg) runs on the writer thread once the
        bundle is durable — for dependent small writes that must not land
        before the bundle they describe (e.g. resume_meta.json)."""
        if not paths:
            return
        keys, host = _fetch_leaves(tree)  # synchronous: donation safety
        paths = [_abs(p) for p in paths]

        def job():
            _write_leaves(paths[0], keys, host)
            for p in paths[1:]:
                _clone_dir(paths[0], p)
            if after is not None:
                after()

        self._submit(paths[0], job)

    def save(self, path: str, tree, after=None) -> None:
        self.save_multi([path], tree, after=after)

    def _submit(self, key: str, job) -> None:
        import threading

        with self._cond:
            if self._error is not None:
                err, self._error = self._error, None
                raise RuntimeError("async checkpoint write failed") from err
            self._queue[key] = job  # replaces an unstarted stale write
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._run, name="ckpt-writer", daemon=True)
                self._thread.start()
            self._cond.notify_all()

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._queue:
                    self._cond.wait()
                key = next(iter(self._queue))
                job = self._queue.pop(key)
                self._inflight = True
            try:
                job()
            except BaseException as e:  # surfaced on wait()/next submit
                with self._cond:
                    if self._error is None:
                        self._error = e
            with self._cond:
                self._inflight = False
                self._cond.notify_all()

    def wait(self) -> None:
        """Block until every queued write is durable; re-raise errors."""
        with self._cond:
            while self._queue or self._inflight:
                self._cond.wait()
            if self._error is not None:
                err, self._error = self._error, None
                raise RuntimeError("async checkpoint write failed") from err


def restore_checkpoint(path: str, template=None):
    path = _abs(path)
    if _is_flat_format(path):
        return _restore_tree(path, template)
    return _orbax_restore(path, template)


def save_train_state(path: str, state) -> None:
    """Resume bundle: params + opt_state + step/epoch counters."""
    _save_tree(_abs(path), state)


def restore_train_state(path: str, template):
    path = _abs(path)
    if _is_flat_format(path):
        return _restore_tree(path, template)
    return _orbax_restore(path, template)


def load_bagon_into_model(model_params, bagon_ckpt_path: str):
    """Warm-start a shelgon-family model from a Bagon checkpoint: replace the
    encoder/decoder subtrees, keep the bottleneck params fresh
    (ref models/shelgon3/Shelgon.py:41-45)."""
    template = {"encoder": model_params["encoder"], "decoder": model_params["decoder"]}
    try:
        loaded = restore_checkpoint(bagon_ckpt_path, template)
    except BaseException:
        # bundle with extra top-level leaves or legacy layout: restore whole
        loaded = restore_checkpoint(bagon_ckpt_path)
        loaded = {"encoder": loaded["encoder"], "decoder": loaded["decoder"]}
    out = dict(model_params)
    out["encoder"] = loaded["encoder"]
    out["decoder"] = loaded["decoder"]
    return out
