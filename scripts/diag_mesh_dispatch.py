"""Diagnose the 1-device-mesh train-step slowness (tpu_smoke round 4:
25.5 s/step mesh vs 105 ms unmeshed, loss bit-identical).

Hypothesis: the axon remote runtime round-trips sharded (NamedSharding)
outputs through the host every dispatch (~880 MB params over the tunnel
~= tens of seconds), i.e. the cost is the SPMD executable path, not the
shard_map'd kernels. Test: an 880 MB-class dummy param tree updated by a
trivial jitted function, (a) plain single-device arrays, (b) the same
arrays committed with NamedSharding over a 1-device mesh. Same math, same
bytes — any large (b)-(a) gap is runtime dispatch pathology, not kernels.

    python scripts/diag_mesh_dispatch.py [--mb 880] [--steps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=880, help="tree size in MB (f32)")
    ap.add_argument("--leaves", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    per_leaf = args.mb * (1 << 20) // 4 // args.leaves
    cols = 1024
    rows = per_leaf // cols
    tree = [jnp.zeros((rows, cols), jnp.float32) for _ in range(args.leaves)]
    print(f"tree: {args.leaves} x ({rows}, {cols}) f32 = "
          f"{args.leaves * rows * cols * 4 / (1 << 20):.0f} MB")

    def run(label, arrays, jit_fn):
        arrays = jax.block_until_ready(arrays)
        out = jit_fn(arrays)
        jax.block_until_ready(out)  # compile
        for i in range(args.steps):
            t0 = time.perf_counter()
            out = jit_fn(out)
            jax.block_until_ready(out)
            print(f"  {label} step {i}: {(time.perf_counter() - t0) * 1e3:8.1f} ms",
                  flush=True)
        return out

    @jax.jit
    def bump(t):
        return [x + 1.0 for x in t]

    print("(a) plain single-device arrays")
    run("plain", [jax.device_put(x) for x in tree], bump)

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("dp",))
    sharding = NamedSharding(mesh, P())
    print("(b) NamedSharding(1-device mesh) arrays")
    run("mesh ", [jax.device_put(x, sharding) for x in tree], bump)

    # (c) the same with a shard_map'd body — adds the manual-axes executable
    from kindergarten_vq_vae_tpu.parallel.mesh import shard_map_nocheck

    mapped = shard_map_nocheck(
        lambda t: [x + 1.0 for x in t], mesh=mesh,
        in_specs=([P()] * args.leaves,), out_specs=[P()] * args.leaves,
    )
    print("(c) shard_map body over the mesh")
    run("smap ", [jax.device_put(x, sharding) for x in tree], jax.jit(mapped))


if __name__ == "__main__":
    main()
