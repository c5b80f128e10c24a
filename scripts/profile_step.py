"""Same-process A/B breakdown of the flagship train step on the real TPU.

Times a ladder of ablated step variants (all batch 1024, chained through
carried state, one final host materialization — see CLAUDE.md on why
per-step syncs are meaningless through the tunnel). Differences between
rungs attribute time to: optimizer update, backward pass, CE loss+MLM head,
decoder trunk, dropout.

    python scripts/profile_step.py [--batch 1024] [--steps 20]
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
import optax


def time_chained(fn, state, n_steps, reps=2):
    """Best-of-reps ms/step for a (state -> state) jitted fn, one final sync."""
    state = fn(state)  # compile + warmup
    jax.block_until_ready(state)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state = fn(state)  # donated buffers: never reuse an old state
        # materialize a scalar from the chain's last value (tunnel-safe sync)
        leaves = jax.tree_util.tree_leaves(state)
        float(jnp.sum(leaves[-1].astype(jnp.float32).ravel()[:1]))
        dt = (time.perf_counter() - t0) / n_steps * 1e3
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.optim import make_optimizer
    from kindergarten_vq_vae_tpu.train.variants import build_model, init_params, make_loss_fn
    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

    B, S = args.batch, 12
    cfg = RunConfig(
        model=ModelConfig(model_name="shelgon3", compute_dtype="bfloat16", vq_use_fused="auto"),
        data=DataConfig(batch_size=B, tokenized_sentence_max_length=S),
    )
    params = init_params(cfg, jax.random.key(0))
    tx = make_optimizer(cfg.optim)
    loss_fn = make_loss_fn(cfg, "train")
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 30522, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "n_valid": jnp.int32(B),
    }

    def grad_touch(grads):
        # anti-DCE: consume one element of EVERY grad leaf (global_norm holds
        # all grads live simultaneously and OOMs at batch 1024)
        return sum(
            g.ravel()[0].astype(jnp.float32) for g in jax.tree_util.tree_leaves(grads)
        )

    def rngs_for(i):
        key = jax.random.fold_in(jax.random.key(1, impl="rbg"), i)
        k1, k2, k3 = jax.random.split(key, 3)
        return {"dropout": k1, "gumbel": k2, "perturb": k3}

    results = {}

    # ---- B: fwd+bwd, no optimizer (carry global grad norm to defeat DCE)
    @functools.partial(jax.jit, donate_argnums=(1,), compiler_options=tpu_compiler_options())
    def step_fwdbwd(params, acc, i):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rngs_for(i), False
        )
        return acc + loss + grad_touch(grads), i + 1

    def wrap_b(st):
        acc, i = st
        return step_fwdbwd(params, acc, i)

    results["B_fwd_bwd"] = time_chained(wrap_b, (jnp.float32(0), jnp.int32(0)), args.steps)
    print(f"B fwd+bwd (+gradnorm):  {results['B_fwd_bwd']:8.2f} ms", flush=True)

    # ---- C: fwd only
    @functools.partial(jax.jit, donate_argnums=(1,), compiler_options=tpu_compiler_options())
    def step_fwd(params, acc, i):
        loss, _ = loss_fn(params, batch, rngs_for(i), False)
        return acc + loss, i + 1

    def wrap_c(st):
        acc, i = st
        return step_fwd(params, acc, i)

    results["C_fwd_only"] = time_chained(wrap_c, (jnp.float32(0), jnp.int32(0)), args.steps)
    print(f"C fwd only:             {results['C_fwd_only']:8.2f} ms", flush=True)

    # ---- D: fwd+bwd, loss = mean(logits) (drops CE; keeps MLM head)
    def loss_mean_logits(params, i):
        out = model.apply(
            {"params": params}, batch["input_ids"], batch["attention_mask"],
            deterministic=False, is_training=True, rngs=rngs_for(i),
        )
        return jnp.mean(out["logits"].astype(jnp.float32)) + out["vq_loss"]

    @functools.partial(jax.jit, donate_argnums=(1,), compiler_options=tpu_compiler_options())
    def step_d(params, acc, i):
        loss, grads = jax.value_and_grad(loss_mean_logits)(params, i)
        return acc + loss + grad_touch(grads), i + 1

    def wrap_d(st):
        acc, i = st
        return step_d(params, acc, i)

    results["D_no_ce"] = time_chained(wrap_d, (jnp.float32(0), jnp.int32(0)), args.steps)
    print(f"D fwd+bwd no-CE:        {results['D_no_ce']:8.2f} ms", flush=True)

    # ---- E: fwd+bwd, encoder+VQ only (drops decoder trunk + head + CE)
    def loss_enc_only(params, i):
        out = model.apply(
            {"params": params}, batch["input_ids"], batch["attention_mask"],
            deterministic=False, is_training=True, rngs=rngs_for(i),
            method=None,
        )
        return jnp.mean(out["z_q"].astype(jnp.float32)) + out["vq_loss"]

    @functools.partial(jax.jit, donate_argnums=(1,), compiler_options=tpu_compiler_options())
    def step_e(params, acc, i):
        loss, grads = jax.value_and_grad(loss_enc_only)(params, i)
        return acc + loss + grad_touch(grads), i + 1

    def wrap_e(st):
        acc, i = st
        return step_e(params, acc, i)

    results["E_enc_vq_only"] = time_chained(wrap_e, (jnp.float32(0), jnp.int32(0)), args.steps)
    print(f"E enc+VQ fwd+bwd:       {results['E_enc_vq_only']:8.2f} ms  (note: decoder still computed+differentiated? no — DCE'd)", flush=True)

    # ---- F: deterministic fwd+bwd (no dropout anywhere)
    @functools.partial(jax.jit, donate_argnums=(1,), compiler_options=tpu_compiler_options())
    def step_f(params, acc, i):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rngs_for(i), True
        )
        return acc + loss + grad_touch(grads), i + 1

    def wrap_f(st):
        acc, i = st
        return step_f(params, acc, i)

    results["F_no_dropout"] = time_chained(wrap_f, (jnp.float32(0), jnp.int32(0)), args.steps)
    print(f"F fwd+bwd no dropout:   {results['F_no_dropout']:8.2f} ms", flush=True)

    # ---- A: full train step (bench parity); opt_state allocated only now
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0,), compiler_options=tpu_compiler_options())
    def step_full(st):
        params, opt_state, i = st
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rngs_for(i), False
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, i + 1

    results["A_full_step"] = time_chained(step_full, (params, opt_state, jnp.int32(0)), args.steps)
    print(f"A full step:            {results['A_full_step']:8.2f} ms", flush=True)

    print("\n--- attribution (ms) ---")
    print(f"optimizer update:  {results['A_full_step'] - results['B_fwd_bwd']:8.2f}")
    print(f"backward pass:     {results['B_fwd_bwd'] - results['C_fwd_only']:8.2f}")
    print(f"CE loss (f+b):     {results['B_fwd_bwd'] - results['D_no_ce']:8.2f}")
    print(f"decoder+head (f+b):{results['D_no_ce'] - results['E_enc_vq_only']:8.2f}")
    print(f"dropout total:     {results['B_fwd_bwd'] - results['F_no_dropout']:8.2f}")
    print(f"sent/s (full):     {args.batch / results['A_full_step'] * 1e3:8.1f}")


if __name__ == "__main__":
    main()
