"""Capture a 3-step jax.profiler trace of the flagship train step and print
the per-op device-time breakdown (top fusions/custom-calls) from the
trace.json.gz — no TensorBoard needed.

    python scripts/trace_step.py [--batch 1024]
"""

import argparse
import functools
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", default="/tmp/kvt_trace")
    args = ap.parse_args()

    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn
    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

    B, S = args.batch, 12
    cfg = RunConfig(
        model=ModelConfig(model_name="shelgon3", compute_dtype="bfloat16",
                          vq_use_fused="auto"),
        data=DataConfig(batch_size=B, tokenized_sentence_max_length=S),
    )
    params = init_params(cfg, jax.random.key(0))
    loss_fn = make_loss_fn(cfg, "train")
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 30522, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "n_valid": jnp.int32(B),
    }

    def grad_touch(grads):
        return sum(g.ravel()[0].astype(jnp.float32)
                   for g in jax.tree_util.tree_leaves(grads))

    @functools.partial(jax.jit, donate_argnums=(1,),
                       compiler_options=tpu_compiler_options())
    def step(params, acc, i):
        key = jax.random.fold_in(jax.random.key(1, impl="rbg"), i)
        rngs = dict(zip(("dropout", "gumbel", "perturb"), jax.random.split(key, 3)))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rngs, False)
        return acc + loss + grad_touch(grads), i + 1

    acc, i = jnp.float32(0), jnp.int32(0)
    acc, i = step(params, acc, i)
    jax.block_until_ready(acc)

    jax.profiler.start_trace(args.out)
    for _ in range(3):
        acc, i = step(params, acc, i)
    float(acc)
    jax.profiler.stop_trace()

    # ---- parse the trace: sum device-stream event durations by op name
    files = sorted(glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("no trace file found under", args.out)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    totals = defaultdict(float)
    count = defaultdict(int)
    meta = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] += e.get("dur", 0.0)
        count[name] += 1
        a = e.get("args") or {}
        info = a.get("long_name") or a.get("tf_op") or a.get("source") or ""
        if info and name not in meta:
            meta[name] = str(info)
    total_us = sum(totals.values())
    print(f"device events total: {total_us / 1e3:.2f} ms over 3 steps "
          f"({total_us / 3e3:.2f} ms/step)")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us / 3e3:9.3f} ms/step  x{count[name] // 3:<4d} {name[:80]}")
        if meta.get(name):
            print(f"             {meta[name][:160]}")


if __name__ == "__main__":
    main()
