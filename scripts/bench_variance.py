"""Tunnel-variance characterization of the official benchmark (VERDICT r2 #10).

Runs the exact bench.py train step in ONE process, N independent reps of
``--steps`` chained steps each (one host materialization per rep), and prints
every rep plus median/min/max/IQR — so RESULTS.md can quote a spread instead
of a single best-of-2 (the tunneled chip varies run-to-run).

    python scripts/bench_variance.py [--reps 7] [--steps 30] [--out VARIANCE.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import functools

    import bench
    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn
    from kindergarten_vq_vae_tpu.train.optim import make_optimizer
    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options
    import optax

    B, S = bench.BATCH, bench.SEQ
    cfg = RunConfig(
        model=ModelConfig(model_name="shelgon3", compute_dtype="bfloat16", vq_use_fused=True),
        data=DataConfig(batch_size=B, tokenized_sentence_max_length=S),
    )
    params = init_params(cfg, jax.random.key(0))
    tx = make_optimizer(cfg.optim)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(cfg, "train")

    ids, mask = bench._example_batch()
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "n_valid": jnp.int32(B),
    }

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       compiler_options=tpu_compiler_options())
    def train_step(params, opt_state, batch, step):
        key = jax.random.fold_in(jax.random.key(1, impl="rbg"), step)
        k1, k2, k3 = jax.random.split(key, 3)
        rngs = {"dropout": k1, "gumbel": k2, "perturb": k3}
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rngs, False)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, opt_state, loss

    params, opt_state, loss = train_step(params, opt_state, batch, 0)
    assert np.isfinite(float(loss))

    reps_ms, reps_sps = [], []
    for r in range(args.reps):
        t0 = time.perf_counter()
        for i in range(args.steps):
            params, opt_state, loss = train_step(params, opt_state, batch, i + 1)
        final = float(loss)
        dt = (time.perf_counter() - t0) / args.steps
        assert np.isfinite(final)
        reps_ms.append(dt * 1e3)
        reps_sps.append(B / dt)
        print(f"rep {r}: {dt * 1e3:.1f} ms/step  {B / dt:.0f} sent/s", flush=True)

    ms = np.asarray(reps_ms)
    sps = np.asarray(reps_sps)
    summary = {
        "batch": B,
        "steps_per_rep": args.steps,
        "reps_ms_per_step": [round(v, 2) for v in reps_ms],
        "ms_median": round(float(np.median(ms)), 2),
        "ms_min": round(float(ms.min()), 2),
        "ms_max": round(float(ms.max()), 2),
        "ms_iqr": [round(float(np.percentile(ms, 25)), 2),
                   round(float(np.percentile(ms, 75)), 2)],
        "sps_median": round(float(np.median(sps)), 1),
        "sps_best": round(float(sps.max()), 1),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
