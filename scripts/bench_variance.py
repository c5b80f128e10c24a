"""Tunnel-variance characterization of the official benchmark (VERDICT r2 #10).

Runs the exact bench.py train step in ONE process, N independent reps of
``--steps`` chained steps each (one host materialization per rep), and prints
every rep plus median/min/max/IQR — so RESULTS.md can quote a spread instead
of a single best-of-2 (the tunneled chip varies run-to-run).

    python scripts/bench_variance.py [--reps 7] [--steps 30] [--out VARIANCE.json]

``--ab chain,jnp`` additionally A/Bs optimizer paths in the SAME process
(phase per variant, buffers freed between phases): "chain" = the optax
Adam+amsgrad chain (train/optim.make_optimizer), "jnp" / "kernel" = the
FusedAdam single-pass update (ops/adam_pallas.FusedAdam, path=...). This is
the measurement that decides whether resolve_fused_update's "auto" should
select the crash-safe jnp path on single-device TPU (NEXT.md #2).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _measure(train_step, params, opt_state, batch, reps, steps, batch_size, tag):
    import numpy as np

    reps_ms = []
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(steps):
            params, opt_state, loss = train_step(params, opt_state, batch, i + 1)
        final = float(loss)
        dt = (time.perf_counter() - t0) / steps
        assert np.isfinite(final)
        reps_ms.append(dt * 1e3)
        print(f"[{tag}] rep {r}: {dt * 1e3:.1f} ms/step  {batch_size / dt:.0f} sent/s",
              flush=True)
    return reps_ms, params, opt_state


def _summary(reps_ms, batch_size, steps):
    ms = np.asarray(reps_ms)
    sps = batch_size / (ms / 1e3)
    return {
        "batch": batch_size,
        "steps_per_rep": steps,
        "reps_ms_per_step": [round(v, 2) for v in reps_ms],
        "ms_median": round(float(np.median(ms)), 2),
        "ms_min": round(float(ms.min()), 2),
        "ms_max": round(float(ms.max()), 2),
        "ms_iqr": [round(float(np.percentile(ms, 25)), 2),
                   round(float(np.percentile(ms, 75)), 2)],
        "sps_median": round(float(np.median(sps)), 1),
        "sps_best": round(float(sps.max()), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ab", default=None, metavar="V1,V2",
                    help="comma list of optimizer paths to A/B in one process: "
                         "chain | jnp | kernel (default: chain only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import functools

    import bench
    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn
    from kindergarten_vq_vae_tpu.train.optim import make_optimizer
    from kindergarten_vq_vae_tpu.ops.adam_pallas import FusedAdam
    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options
    import optax

    B, S = bench.BATCH, bench.SEQ
    cfg = RunConfig(
        model=ModelConfig(model_name="shelgon3", compute_dtype="bfloat16", vq_use_fused="auto"),
        data=DataConfig(batch_size=B, tokenized_sentence_max_length=S),
    )
    loss_fn = make_loss_fn(cfg, "train")

    ids, mask = bench._example_batch()
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "n_valid": jnp.int32(B),
    }

    variants = (args.ab or "chain").split(",")
    results = {}
    for variant in variants:
        variant = variant.strip()
        if variant == "chain":
            tx = make_optimizer(cfg.optim)
            update = tx.update
            init = tx.init

            def apply_update(grads, opt_state, params, _update=update):
                upd, opt_state = _update(grads, opt_state, params)
                return optax.apply_updates(params, upd), opt_state
        else:
            fa = FusedAdam(cfg.optim, path=variant)
            init = fa.init

            def apply_update(grads, opt_state, params, _fa=fa):
                return _fa.apply(grads, opt_state, params)

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           compiler_options=tpu_compiler_options())
        def train_step(params, opt_state, batch, step, _apply=apply_update):
            key = jax.random.fold_in(jax.random.key(1, impl="rbg"), step)
            k1, k2, k3 = jax.random.split(key, 3)
            rngs = {"dropout": k1, "gumbel": k2, "perturb": k3}
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rngs, False)
            params, opt_state = _apply(grads, opt_state, params)
            return params, opt_state, loss

        params = init_params(cfg, jax.random.key(0))
        opt_state = init(params)
        params, opt_state, loss = train_step(params, opt_state, batch, 0)
        assert np.isfinite(float(loss))

        reps_ms, params, opt_state = _measure(
            train_step, params, opt_state, batch, args.reps, args.steps, B, variant)
        results[variant] = _summary(reps_ms, B, args.steps)
        # free this variant's HBM before compiling the next one
        del params, opt_state, train_step
        print(f"[{variant}] median {results[variant]['ms_median']} ms/step", flush=True)

    out = results if len(results) > 1 else results[variants[0].strip()]
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
