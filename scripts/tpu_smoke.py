"""Real-TPU smoke check: run the compiled (non-interpret) hot paths on the
attached chip. The pytest suite pins itself to the virtual CPU mesh; this
script is the complement, meant to run whenever a real device is available.

    python scripts/tpu_smoke.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    assert jax.default_backend() == "tpu", f"expected tpu, got {jax.default_backend()}"
    print(f"device: {jax.devices()[0]}")

    # 1. fused VQ kernel compiled, exact parity vs oracle
    from kindergarten_vq_vae_tpu.ops.vq import vector_quantize
    from kindergarten_vq_vae_tpu.ops.vq_pallas import fused_vector_quantize

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(256, 12, 768)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(9, 768)), jnp.float32)
    fused = jax.jit(lambda z, e: fused_vector_quantize(z, e, 0.25))(z, e)
    ref = jax.jit(lambda z, e: vector_quantize(z, e, 0.25))(z, e)
    assert bool(jnp.all(fused.indices == ref.indices)), "kernel index mismatch"
    assert abs(float(fused.loss) - float(ref.loss)) < 1e-4, "kernel loss mismatch"
    print("fused VQ kernel: exact parity OK")

    # 2. flagship train step compiles + finite loss + throughput
    import optax

    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.optim import make_optimizer
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn

    cfg = RunConfig(
        model=ModelConfig(model_name="shelgon3", compute_dtype="bfloat16", vq_use_fused="auto"),
        data=DataConfig(batch_size=512, tokenized_sentence_max_length=12),
    )
    params = init_params(cfg, jax.random.key(0))
    tx = make_optimizer(cfg.optim)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(cfg, "train")
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 30522, (512, 12)), jnp.int32),
        "attention_mask": jnp.ones((512, 12), jnp.int32),
        "n_valid": jnp.int32(512),
    }

    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

    params0 = params  # keep the init tree for the mesh-path parity check

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def step(params, opt_state, batch, i):
        key = jax.random.fold_in(jax.random.key(1), i)
        rngs = dict(zip(("dropout", "gumbel", "perturb"), jax.random.split(key, 3)))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rngs, False)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, batch, 0)
    jax.block_until_ready(loss)
    loss0 = float(loss)
    assert np.isfinite(loss0), "non-finite train loss"
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, batch, i + 1)
    jax.block_until_ready((params, loss))
    dt = (time.perf_counter() - t0) / n
    print(f"flagship train step: {dt * 1e3:.2f} ms -> {512 / dt:.0f} sentences/sec, loss {float(loss):.4f}")

    # 3. the MESH path on silicon: 1-device dp mesh, full sharded train step
    # (_fused_trunk_sharded + fused_vector_quantize_sharded +
    # fused_head_ce_loss_sharded) COMPILED, not interpret-mode — the only
    # hardware validation of the shard_map'd custom-call compositions the
    # virtual-CPU tests exercise (this backend has measured on-chip-only
    # custom-call failure modes, see CLAUDE.md).
    from kindergarten_vq_vae_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    mesh = make_mesh((1,), ("dp",))
    loss_fn_m = make_loss_fn(cfg, "train", mesh=mesh)
    params_m = shard_params(mesh, params0)
    opt_state_m = tx.init(params_m)
    batch_m = shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def step_m(params, opt_state, batch, i):
        key = jax.random.fold_in(jax.random.key(1), i)
        rngs = dict(zip(("dropout", "gumbel", "perturb"), jax.random.split(key, 3)))
        (loss, _), grads = jax.value_and_grad(loss_fn_m, has_aux=True)(params, batch, rngs, False)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params_m, opt_state_m, loss_m = step_m(params_m, opt_state_m, batch_m, 0)
    jax.block_until_ready(loss_m)
    loss_m0 = float(loss_m)
    assert np.isfinite(loss_m0), "non-finite mesh-path train loss"
    # same init/batch/rng as the unmeshed first step; a 1-wide dp shard folds
    # index 0 into the dropout seeds, so the paths differ only by kernel
    # composition (fused head+CE vs XLA head + streaming CE) -> loose gate
    rel = abs(loss_m0 - loss0) / max(abs(loss0), 1e-6)
    assert rel < 2e-2, f"mesh-path loss {loss_m0:.4f} vs unmeshed {loss0:.4f} ({rel:.1%})"
    t0 = time.perf_counter()
    for i in range(n):
        params_m, opt_state_m, loss_m = step_m(params_m, opt_state_m, batch_m, i + 1)
    jax.block_until_ready((params_m, loss_m))
    dt_m = (time.perf_counter() - t0) / n
    print(
        f"mesh(1-dev dp) train step: {dt_m * 1e3:.2f} ms -> {512 / dt_m:.0f} "
        f"sentences/sec, loss {float(loss_m):.4f} (unmeshed first-step loss "
        f"{loss0:.4f} vs mesh {loss_m0:.4f})"
    )
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
