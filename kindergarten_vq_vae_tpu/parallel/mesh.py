"""Device-mesh + sharding layer (TPU-native; the reference has no
distributed training at all, SURVEY §5.8 — this layer is added capability).

Design: GSPMD-style. Parameters and batches get NamedSharding annotations
over a ("dp", "tp") Mesh; XLA inserts the ICI collectives (all-reduce for DP
gradient sync, all-gather/reduce-scatter around TP matmuls). No hand-written
communication — the scaling-book recipe: pick a mesh, annotate shardings,
let XLA do the rest.

Tensor-parallel layout (Megatron-style column->row pairs, zero collectives
inside a layer until the row matmul's reduce):
- attention QKV kernel (H, 3H)   -> shard output dim over tp (heads split)
- attention out kernel (H, H)    -> shard input dim over tp (row parallel)
- cross-attn q/kv kernels        -> same column split; out row split
- MLP intermediate (H, 4H)       -> column split; MLP output (4H, H) row split
- word embeddings (V, H)         -> shard vocab dim (tied MLM head then
  computes vocab-sharded logits; the loss's log-softmax reduction is XLA's
  problem and it handles it with one all-reduce over tp)
- LayerNorms, biases of row-parallel matmuls, everything small -> replicated
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_map_nocheck(fn, mesh, in_specs, out_specs):
    """Canonical shard_map entry for every module in this package.

    One place owns the jax-version dance: modern jax exposes ``jax.shard_map``
    as a function attribute (``from jax.shard_map import ...`` is a
    ModuleNotFoundError, and ``jax.experimental.shard_map`` emits a
    DeprecationWarning since v0.8). Replication checking is disabled because
    our shard_mapped bodies run Pallas kernels whose out_shapes carry no
    varying-manual-axes info (``check_vma`` on new jax, ``check_rep`` on old).
    """
    sm = getattr(jax, "shard_map", None)
    if sm is None:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map as sm  # type: ignore
    try:
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host (DCN) init. One call per process before any mesh building;
    afterwards ``jax.devices()`` is the GLOBAL device list and GSPMD lays
    DP-gradient all-reduces across hosts over DCN while TP stays on-host ICI
    (make_mesh orders axes so the fastest-varying axis is on-host).

    On managed TPU pods (GKE/QueuedResources) all three arguments can be
    None — jax.distributed auto-detects from the environment."""
    import jax.distributed

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(shape=(), axis_names=(), devices=None) -> Mesh | None:
    """Build a Mesh; shape () -> None (single-device path).

    Multi-host: with jax.distributed initialized, ``jax.devices()`` is
    global; keep the LAST axis (tp) fastest-varying so it maps onto each
    host's local devices (ICI) and leading axes (dp / dp_host) span hosts
    (DCN) — the scaling-book layout: data-parallel over DCN, model-parallel
    over ICI."""
    if not shape:
        return None
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def _rule_for_path(path: tuple, names: tuple) -> P:
    tp = "tp" if "tp" in names else None
    if tp is None:
        return P()
    last2 = path[-2:] if len(path) >= 2 else path
    # column-parallel kernels: shard the output features
    if last2 in (("qkv", "kernel"), ("q", "kernel"), ("kv", "kernel"), ("intermediate", "kernel")):
        return P(None, tp)
    if last2 in (("qkv", "bias"), ("q", "bias"), ("kv", "bias"), ("intermediate", "bias")):
        return P(tp)
    # row-parallel kernels: shard the input features
    if last2 in (("out", "kernel"), ("output", "kernel")):
        return P(tp, None)
    # vocab-sharded embedding table (also the tied MLM head kernel)
    if last2 == ("word_embeddings", "embedding"):
        return P(tp, None)
    if path[-1] == "decoder_bias":  # (V,) vocab-aligned bias
        return P(tp)
    return P()


def param_sharding_rules(params, mesh: Mesh):
    """NamedSharding pytree matching ``params``."""
    from flax import traverse_util

    names = mesh.axis_names
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = _rule_for_path(path, names)
        # skip specs that don't divide the dims evenly
        ok = True
        dims = getattr(leaf, "shape", ())
        for axis, part in enumerate(spec):
            if part is None:
                continue
            size = mesh.shape[part]
            if axis >= len(dims) or dims[axis] % size != 0:
                ok = False
        out[path] = NamedSharding(mesh, spec if ok else P())
    return traverse_util.unflatten_dict(out)


def shard_params(mesh: Mesh, params):
    shardings = param_sharding_rules(params, mesh)
    return jax.device_put(params, shardings)


def dp_axes(mesh: Mesh) -> tuple:
    """All data-parallel axes, e.g. ("dp_host", "dp") on a 3-axis DCN mesh."""
    return tuple(n for n in mesh.axis_names if str(n).startswith("dp"))


def batch_spec(mesh: Mesh) -> P:
    axes = dp_axes(mesh)
    return P(axes) if axes else P()


def shard_batch(mesh: Mesh, batch: dict):
    """Shard batch arrays over dp on the leading axis; scalars replicated.

    Single-process: a plain device_put with a NamedSharding. Multi-host:
    each process holds only ITS slice of the global batch (see
    ``BatchIterator(process_index=..., process_count=...)``) and the global
    array is assembled with make_array_from_process_local_data — no
    cross-host batch gather ever happens."""
    spec = batch_spec(mesh)
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        sharding = NamedSharding(mesh, P() if arr.ndim == 0 else spec)
        if multiprocess and arr.ndim > 0:
            out[k] = jax.make_array_from_process_local_data(sharding, arr)
        else:
            out[k] = jax.device_put(arr, sharding)
    return out
