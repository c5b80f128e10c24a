"""Same-process in-jit A/B of the fused VQ kernel (block_rows sweep) vs the
jnp oracle at a given shape, with loss+perplexity consumed (DCE-fair).

Round-3 context: at the flagship shape (12288 rows x 768, 9 codes) the
z_q-only A/B read the kernel SLOWER than the oracle (0.73-0.75x); this
script measures the fair comparison and whether the default block_rows=512
is mis-tiled at large row counts.

    python scripts/ab_vq_tile.py [--rows 12288] [--dim 768] [--ne 9]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12288)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--ne", type=int, default=9)
    ap.add_argument("--inner", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from kindergarten_vq_vae_tpu.ops.vq import vector_quantize
    from kindergarten_vq_vae_tpu.ops.vq_pallas import fused_vector_quantize

    rng = np.random.default_rng(0)
    S = 12
    B = args.rows // S
    z = jnp.asarray(rng.normal(size=(B, S, args.dim)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(args.ne, args.dim)), jnp.float32)

    def timed(fn, label):
        @jax.jit
        def chain(z_in):
            def body(c, _):
                z_c, acc = c
                out = fn(z_c, emb, 0.25)
                return (out.z_q, acc + out.loss + out.perplexity), ()

            (c, acc), _ = lax.scan(body, (z_in, jnp.float32(0.0)), None, length=args.inner)
            return c, acc

        cur, acc = chain(z)
        jax.block_until_ready(cur)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            cur, acc = chain(z)
            float(acc + jnp.sum(cur[:1, :1, :1]))
            dt = (time.perf_counter() - t0) / args.inner * 1e6
            best = dt if best is None else min(best, dt)
        print(f"{label:28s}: {best:8.1f} us/call")
        return best

    t_o = timed(vector_quantize, "jnp oracle")
    for br in (512, 1024, 2048, 4096):
        if br > args.rows:
            continue
        t_k = timed(
            functools.partial(fused_vector_quantize, block_rows=br),
            f"fused kernel block_rows={br}",
        )
        print(f"  -> vs oracle: {t_o / t_k:.2f}x")


if __name__ == "__main__":
    main()
