"""Bisect the fused-Adam x fused-trunk axon worker crash (VERDICT r3 #3).

Round-3 finding: the Pallas Adam kernel passes every component-level on-chip
configuration (all flagship leaf shapes standalone, the full 402-leaf tree
with a trivial loss, a real XLA-trunk step), but ONE program that contains
both the fused trunk kernels and the Adam pallas calls reproducibly kills
the axon remote worker (`UNAVAILABLE: TPU worker process crashed`). This
script shrinks that composition along the axes that could plausibly matter:

  --layers N        trunk depth (custom-call count from the trunk side)
  --adam-leaves K   how many ELIGIBLE leaves use the pallas kernel (the rest
                    take the jnp expression) — custom-call count, adam side
  --fused-layer X   on|off — the known-good control
  --batch B         program working-set size
  --steps S         re-execution count (the aliasing poison was a
                    re-execution failure; the crash may be too)

One configuration per process (a crashed worker can wedge the tunnel; the
driver of the bisect is scripts/bisect_fused_adam.sh-style manual runs).
Prints CONFIG ... OK/relevant loss, or dies with the backend error.

    python scripts/bisect_fused_adam.py --layers 12 --adam-leaves all
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
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--adam-leaves", default="all",
                    help="'all' | int K: first K eligible leaves on the kernel path")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--fused-layer", default="on", choices=("on", "off"))
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--head-ce", action="store_true",
                    help="also run the fused head+CE kernel (more custom calls)")
    args = ap.parse_args()

    from kindergarten_vq_vae_tpu.ops import adam_pallas
    from kindergarten_vq_vae_tpu.ops.adam_pallas import FusedAdam, _kernel_eligible
    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, OptimConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn
    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

    assert jax.default_backend() == "tpu", jax.default_backend()

    cfg = RunConfig(
        model=ModelConfig(
            model_name="shelgon3", compute_dtype="bfloat16",
            num_layers=args.layers, vq_use_fused=True,
            fused_layer=args.fused_layer,
            fused_ce=not args.head_ce,
        ),
        data=DataConfig(batch_size=args.batch, tokenized_sentence_max_length=12),
        optim=OptimConfig(amsgrad=True),
    )
    params = init_params(cfg, jax.random.key(0))
    loss_fn = make_loss_fn(cfg, "train")

    # cap the number of pallas-kernel adam leaves: monkeypatch eligibility
    if args.adam_leaves != "all":
        k = int(args.adam_leaves)
        counter = {"n": 0}
        orig = _kernel_eligible

        def capped(leaf):
            if orig(leaf) and counter["n"] < k:
                counter["n"] += 1
                return True
            return False

        adam_pallas._kernel_eligible = capped

    fa = FusedAdam(cfg.optim, path="kernel")
    opt_state = fa.init(params)
    n_eligible = sum(
        _kernel_eligible(l) for l in jax.tree_util.tree_leaves(params)
    ) if args.adam_leaves == "all" else int(args.adam_leaves)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 30522, (args.batch, 12)), jnp.int32),
        "attention_mask": jnp.ones((args.batch, 12), jnp.int32),
        "n_valid": jnp.int32(args.batch),
    }

    donate = () if args.no_donate else (0, 1)

    @functools.partial(jax.jit, donate_argnums=donate,
                       compiler_options=tpu_compiler_options())
    def step(params, opt_state, batch, i):
        key = jax.random.fold_in(jax.random.key(1), i)
        rngs = dict(zip(("dropout", "gumbel", "perturb"), jax.random.split(key, 3)))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rngs, False)
        new_params, new_state = fa.apply(grads, opt_state, params)
        return new_params, new_state, loss

    desc = (f"layers={args.layers} adam_kernel_leaves={n_eligible} "
            f"batch={args.batch} fused_layer={args.fused_layer} "
            f"donate={not args.no_donate} head_ce={args.head_ce}")
    print(f"CONFIG {desc}", flush=True)
    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, batch, i)
        jax.block_until_ready(loss)  # per-step sync: surface the crash at its step
        print(f"  step {i}: loss={float(loss):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    print(f"OK {desc}", flush=True)


if __name__ == "__main__":
    main()
