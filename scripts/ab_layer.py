"""Same-process A/B of the fused whole-layer kernel on the real TPU.

Times the flagship fwd+bwd (and the full train step) with
cfg.model.fused_layer on vs off (off falls back to the fused-SDPA path) —
chained steps, one final materialization (CLAUDE.md tunnel methodology).

    python scripts/ab_layer.py [--batch 1024] [--steps 20] [--tbf 64] [--tbb 16]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def time_chained(fn, state, n_steps, reps=2):
    state = fn(state)
    jax.block_until_ready(state)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state = fn(state)
        leaves = jax.tree_util.tree_leaves(state)
        float(jnp.sum(leaves[-1].astype(jnp.float32).ravel()[:1]))
        dt = (time.perf_counter() - t0) / n_steps * 1e3
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--tbf", type=int, default=64)
    ap.add_argument("--tbb", type=int, default=32)
    ap.add_argument("--skip-off", action="store_true")
    ap.add_argument("--sweep", default="",
                    help="comma list of tbf:tbb[:chunk] combos to time after the main run")
    args = ap.parse_args()

    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.optim import make_optimizer
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn

    B, S = args.batch, 12
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 30522, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "n_valid": jnp.int32(B),
    }

    def grad_touch(grads):
        return sum(
            g.ravel()[0].astype(jnp.float32) for g in jax.tree_util.tree_leaves(grads)
        )

    def rngs_for(i):
        key = jax.random.fold_in(jax.random.key(1, impl="rbg"), i)
        k1, k2, k3 = jax.random.split(key, 3)
        return {"dropout": k1, "gumbel": k2, "perturb": k3}

    def measure(fused: str, label: str, tbf=None, tbb=None, chunk=None,
                gelu_exact=True, fchunk=None):
        model = ModelConfig(
            model_name="shelgon3", compute_dtype="bfloat16",
            vq_use_fused=True, fused_layer=fused,
            layer_block_b_fwd=tbf or args.tbf, layer_block_b_bwd=tbb or args.tbb,
            gelu_exact=gelu_exact,
        )
        if chunk is not None:
            model = dataclasses.replace(model, layer_attn_chunk=chunk)
        if fchunk is not None:
            model = dataclasses.replace(model, layer_attn_chunk_fwd=fchunk)
        cfg = RunConfig(
            model=model,
            data=DataConfig(batch_size=B, tokenized_sentence_max_length=S),
        )
        params = init_params(cfg, jax.random.key(0))
        loss_fn = make_loss_fn(cfg, "train")

        from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

        @functools.partial(jax.jit, donate_argnums=(1,),
                           compiler_options=tpu_compiler_options())
        def step(params, acc, i):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rngs_for(i), False
            )
            return acc + loss + grad_touch(grads), i + 1

        def wrap(st):
            acc, i = st
            return step(params, acc, i)

        t = time_chained(wrap, (jnp.float32(0), jnp.int32(0)), args.steps)
        print(f"{label}: {t:8.2f} ms/step  ({args.batch / t * 1e3:,.0f} sent/s fwd+bwd)",
              flush=True)
        return t

    t_on = measure("on", f"fused_layer ON  (tbf={args.tbf} tbb={args.tbb})")
    if not args.skip_off:
        t_off = measure("off", "fused_layer OFF (fused-SDPA path)")
        print(f"speedup: {t_off / t_on:.2f}x", flush=True)
    for combo in [c for c in args.sweep.split(",") if c]:
        parts = combo.split(":")
        gelu_exact = "g" not in parts
        parts = [q for q in parts if q != "g"]
        tbf, tbb = int(parts[0]), int(parts[1])
        chunk = int(parts[2]) if len(parts) > 2 else None
        fchunk = int(parts[3]) if len(parts) > 3 else None
        try:
            measure("on", f"fused_layer ON  (tbf={tbf} tbb={tbb} chunk={chunk}"
                    f" fchunk={fchunk} gelu_exact={gelu_exact})",
                    tbf=tbf, tbb=tbb, chunk=chunk, gelu_exact=gelu_exact,
                    fchunk=fchunk)
        except Exception as e:  # e.g. VMEM OOM at this tiling — keep sweeping
            print(f"tbf={tbf} tbb={tbb} chunk={chunk} fchunk={fchunk}: FAILED "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
