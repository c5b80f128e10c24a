"""A/B: per-step dispatch vs a lax.scan multi-step train dispatch.

Motivation (trace_step at batch 2048, quiet chip 2026-08-19): the jitted
flagship train step executes 339.1 ms of device time but the chained wall
clock is 353.35 ms/step — a ~14 ms/step host-dispatch gap through the
tunneled runtime (donated-buffer rebinding + enqueue for a 400-leaf tree
each step). Scanning K steps inside ONE jit over a stacked (K, B, S) batch
amortizes that gap K-fold. This is the real training shape too: the engine
can stage K batches per dispatch (data loading already prefetches).

    python scripts/ab_scan_steps.py [--batch 2048] [--k 8] [--steps 24]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24, help="total steps per rep")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.optim import make_optimizer
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn
    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

    B, S, K = args.batch, 12, args.k
    assert args.steps % K == 0, "--steps must be a multiple of --k"
    cfg = RunConfig(
        model=ModelConfig(model_name="shelgon3", compute_dtype="bfloat16", vq_use_fused="auto"),
        data=DataConfig(batch_size=B, tokenized_sentence_max_length=S),
        optim=OptimConfig(),
    )
    params = init_params(cfg, jax.random.key(0))
    loss_fn = make_loss_fn(cfg, "train")
    tx = make_optimizer(cfg.optim)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 30522, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    batch1 = {"input_ids": ids, "attention_mask": mask, "n_valid": jnp.int32(B)}
    import optax

    def one_step(params, opt_state, batch, step):
        key = jax.random.fold_in(jax.random.key(1, impl="rbg"), step)
        k1, k2, k3 = jax.random.split(key, 3)
        rngs = {"dropout": k1, "gumbel": k2, "perturb": k3}
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rngs, False)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1), compiler_options=tpu_compiler_options())
    def step_single(params, opt_state, batch, step):
        return one_step(params, opt_state, batch, step)

    # scan over K stacked microbatches: one dispatch, K optimizer steps
    batchK = {
        "input_ids": jnp.broadcast_to(ids, (K, B, S)),
        "attention_mask": jnp.broadcast_to(mask, (K, B, S)),
        "n_valid": jnp.broadcast_to(jnp.int32(B), (K,)),
    }

    @functools.partial(jax.jit, donate_argnums=(0, 1), compiler_options=tpu_compiler_options())
    def step_scanK(params, opt_state, batchK, step0):
        def body(carry, xs):
            params, opt_state = carry
            batch, i = xs
            params, opt_state, loss = one_step(params, opt_state, batch, i)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (batchK, step0 + jnp.arange(K, dtype=jnp.int32)))
        return params, opt_state, losses[-1]

    def timed(label, fn, n_calls, steps_per_call):
        nonlocal params, opt_state
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for c in range(n_calls):
                if steps_per_call == 1:
                    params, opt_state, loss = fn(params, opt_state, batch1, jnp.int32(c))
                else:
                    params, opt_state, loss = fn(params, opt_state, batchK, jnp.int32(c * K))
            final = float(loss)
            assert np.isfinite(final)
            dt = (time.perf_counter() - t0) / (n_calls * steps_per_call) * 1e3
            best = dt if best is None else min(best, dt)
            print(f"[{label}] {dt:.2f} ms/step  ({B / dt * 1e3:,.0f} sent/s)", flush=True)
        return best

    # warm up both compiles before timing
    params, opt_state, l1 = step_single(params, opt_state, batch1, jnp.int32(0))
    assert np.isfinite(float(l1))
    params, opt_state, lK = step_scanK(params, opt_state, batchK, jnp.int32(0))
    assert np.isfinite(float(lK))

    t1 = timed("single", step_single, args.steps, 1)
    tK = timed(f"scan{K}", step_scanK, args.steps // K, K)
    print(f"single {t1:.2f} ms/step vs scan{K} {tK:.2f} ms/step: "
          f"{(t1 - tK):.2f} ms/step recovered ({t1 / tK:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
