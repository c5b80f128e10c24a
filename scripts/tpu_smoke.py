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
        model=ModelConfig(model_name="shelgon3", compute_dtype="bfloat16", vq_use_fused=True),
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

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def step(params, opt_state, batch, i):
        key = jax.random.fold_in(jax.random.key(1), i)
        rngs = dict(zip(("dropout", "gumbel", "perturb"), jax.random.split(key, 3)))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rngs, False)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, batch, 0)
    jax.block_until_ready(loss)
    assert np.isfinite(float(loss)), "non-finite train loss"
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, batch, i + 1)
    jax.block_until_ready((params, loss))
    dt = (time.perf_counter() - t0) / n
    print(f"flagship train step: {dt * 1e3:.2f} ms -> {512 / dt:.0f} sentences/sec, loss {float(loss):.4f}")
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
