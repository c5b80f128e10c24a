"""Ahead-of-time serialized serving artifacts (jax.export / StableHLO).

Beyond-reference deployment capability (the reference has no serving layer,
SURVEY §1): compile a run's deterministic reconstruction forward ONCE,
serialize the lowered StableHLO program to disk, and serve it later without
the model-building Python (or its compile latency) in the serving process.
Parameters stay OUT of the artifact — the exported program takes the param
tree as a call argument, so one artifact serves any checkpoint of the same
geometry and the artifact stays small (~1 MB of MLIR vs ~880 MB of weights).

Artifact layout: ``<out>.stablehlo`` (the serialized program) plus
``<out>.json`` (model_name / seq_len / bucket / platforms metadata).

Usage::

    python -m kindergarten_vq_vae_tpu.serve.export <run_dir> \
        [--bucket 256] [--out path] [--platform cpu|tpu] [--check]
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def export_reconstructor(
    run_path: str,
    bucket: int = 256,
    ckpt_name: str | None = None,
    out_path: str | None = None,
    platforms: tuple = None,
):
    """Serialize the run's reconstruction forward at a fixed bucket size.

    Returns (artifact_path, meta dict). The exported program's calling
    convention is ``(params, ids[bucket, seq], mask[bucket, seq]) ->
    (recon_ids, codes)`` — identical to ``Reconstructor._forward``.
    """
    from kindergarten_vq_vae_tpu.serve.reconstructor import Reconstructor

    r = Reconstructor(run_path, ckpt_name, batch_buckets=(bucket,))
    spec = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
    params_spec = jax.tree_util.tree_map(spec, r.params)
    ids_spec = jax.ShapeDtypeStruct((bucket, r.seq_len), jnp.int32)

    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exp = jax.export.export(jax.jit(r._forward), **kwargs)(
        params_spec, ids_spec, ids_spec
    )
    blob = exp.serialize()

    out = out_path or os.path.join(run_path, f"serve_{r.model_name}_b{bucket}")
    with open(out + ".stablehlo", "wb") as f:
        f.write(blob)
    meta = {
        "model_name": r.model_name,
        "seq_len": r.seq_len,
        "bucket": bucket,
        "platforms": list(exp.platforms),
        "ckpt_name": ckpt_name,
        "nr_devices": exp.nr_devices,
    }
    with open(out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return out, meta


def load_exported(artifact_path: str):
    """(call_fn, meta) from an exported artifact. ``call_fn(params, ids,
    mask)`` executes the serialized program under jit on the current
    backend (the program must have been exported for this platform)."""
    with open(artifact_path + ".stablehlo", "rb") as f:
        exp = jax.export.deserialize(f.read())
    with open(artifact_path + ".json") as f:
        meta = json.load(f)
    return jax.jit(exp.call), meta


def _main():
    import argparse

    p = argparse.ArgumentParser(
        description="export a run's reconstruction forward as a serialized "
                    "StableHLO serving artifact"
    )
    p.add_argument("run_dir")
    p.add_argument("--bucket", type=int, default=256)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None,
                   help="lowering platform (default: the current backend); "
                        "e.g. 'tpu' to cross-compile a deployable artifact "
                        "from a CPU host")
    p.add_argument("--check", action="store_true",
                   help="deserialize and compare against the live forward "
                        "on random ids (requires the current backend to "
                        "match the export platform)")
    args = p.parse_args()

    platforms = (args.platform,) if args.platform else None
    out, meta = export_reconstructor(
        args.run_dir, bucket=args.bucket, ckpt_name=args.ckpt,
        out_path=args.out, platforms=platforms,
    )
    size = os.path.getsize(out + ".stablehlo")
    print(f"exported {meta['model_name']} bucket={meta['bucket']} "
          f"platforms={meta['platforms']} -> {out}.stablehlo ({size/1e6:.2f} MB)")

    if args.check:
        from kindergarten_vq_vae_tpu.serve.reconstructor import Reconstructor

        r = Reconstructor(args.run_dir, args.ckpt, batch_buckets=(args.bucket,))
        call, _ = load_exported(out)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 100, (args.bucket, r.seq_len)), jnp.int32)
        mask = jnp.ones_like(ids)
        got_r, got_c = call(r.params, ids, mask)
        want_r, want_c = jax.jit(r._forward)(r.params, ids, mask)
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        print("check OK: deserialized program matches the live forward")


if __name__ == "__main__":
    _main()
