"""Benchmark: flagship Shelgon3-VQ training throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sentences/sec", "vs_baseline": N}

- TPU side: full jitted train step (fwd + KL recon loss + fused Pallas VQ +
  bwd + adam/amsgrad update) at bert-base geometry, bf16 compute, batch 2048,
  seq 12 — pre-tokenized static-shape inputs. Steps are chained through the
  donated train state so the device executes them back-to-back; one final
  block_until_ready (per-step host sync would measure tunnel latency, not
  compute).
- Baseline: the same-architecture PyTorch model (HF BertModel +
  BertLMHeadModel built from config — the reference's exact module stack,
  models/bagon/Bagon.py:25-31 + shelgon3 VQ) running the same train step on
  CPU, measured once and cached in BASELINE_MEASURED.json. The baseline is
  *favorably* biased: it also gets pre-tokenized inputs and a gather-based
  NLL (the reference tokenizes per step and materializes a (B*S, 30522)
  one-hot, models/shelgon3/Trainer.py:82-98).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "BASELINE_MEASURED.json")

BATCH = int(os.environ.get("KVT_BENCH_BATCH", "2048"))
                   # TPU train batch (throughput sweet spot on one v5e chip;
                   # 2048 amortizes the fixed optimizer update ~5% better than
                   # 1024). Env-overridable for batch-scaling A/Bs only — the
                   # official driver run uses the default.
BASELINE_BATCH = 256  # CPU torch baseline batch (throughput there is
                      # batch-size-insensitive; sentences/sec basis is shared)
SEQ = 12
VOCAB = 30522
N_STEPS = 30


def _example_batch(batch=BATCH, seq=SEQ, vocab=VOCAB):
    rng = np.random.default_rng(0)
    ids = rng.integers(1, vocab, (batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    return ids, mask


def bench_tpu_train() -> float:
    import jax
    import jax.numpy as jnp

    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn

    from kindergarten_vq_vae_tpu.train.config import OptimConfig

    cfg = RunConfig(
        model=ModelConfig(model_name="shelgon3", compute_dtype="bfloat16", vq_use_fused="auto"),
        data=DataConfig(batch_size=BATCH, tokenized_sentence_max_length=SEQ),
        # env knob for optimizer-path A/Bs only; the official driver run
        # uses the default ("auto" -> resolve_fused_update policy)
        optim=OptimConfig(fused_update=os.environ.get("KVT_BENCH_FUSED_UPDATE", "auto")),
    )
    params = init_params(cfg, jax.random.key(0))
    # same optimizer policy as Engine: the fused Adam path when it
    # resolves on, else the optax chain
    from kindergarten_vq_vae_tpu.ops.adam_pallas import FusedAdam, resolve_fused_update

    fused_mode = resolve_fused_update(cfg.optim)
    if fused_mode:
        fa = FusedAdam(cfg.optim, path=fused_mode)
        opt_state = fa.init(params)
        update = fa.apply
    else:
        import optax

        from kindergarten_vq_vae_tpu.train.optim import make_optimizer

        tx = make_optimizer(cfg.optim)
        opt_state = tx.init(params)

        def update(grads, opt_state, params):
            upd, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state

    loss_fn = make_loss_fn(cfg, "train")

    ids, mask = _example_batch()
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "n_valid": jnp.int32(BATCH),
    }

    import functools

    from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       compiler_options=tpu_compiler_options())
    def train_step(params, opt_state, batch, step):
        key = jax.random.fold_in(jax.random.key(1, impl="rbg"), step)
        k1, k2, k3 = jax.random.split(key, 3)
        rngs = {"dropout": k1, "gumbel": k2, "perturb": k3}
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rngs, False)
        params, opt_state = update(grads, opt_state, params)
        return params, opt_state, loss

    # warmup / compile; float() forces full materialization (through the TPU
    # tunnel, block_until_ready alone can under-report)
    params, opt_state, loss = train_step(params, opt_state, batch, 0)
    assert np.isfinite(float(loss))

    # best-of-N against tunnel/chip contention (the chip is shared; identical
    # programs vary run-to-run). The official driver run uses the default
    # N=2; KVT_BENCH_REPEATS>2 additionally emits every repetition + median
    # and spread on stderr for the RESULTS.md variance table (stdout stays
    # the single JSON line).
    reps = int(os.environ.get("KVT_BENCH_REPEATS", "2"))
    dts = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        for i in range(N_STEPS):
            params, opt_state, loss = train_step(params, opt_state, batch, i + 1)
        final = float(loss)  # host materialization of the chain's last value
        dts.append((time.perf_counter() - t0) / N_STEPS)
        assert np.isfinite(final), "non-finite loss in benchmark"
    if reps > 2:
        import sys

        sps = sorted(BATCH / d for d in dts)
        med = sps[len(sps) // 2] if reps % 2 else 0.5 * (sps[reps // 2 - 1] + sps[reps // 2])
        print(
            f"# reps(sent/s): {[round(s, 1) for s in sps]} median={med:.1f} "
            f"best={sps[-1]:.1f} spread={(sps[-1] - sps[0]) / med * 100:.1f}%",
            file=sys.stderr,
        )
    return BATCH / min(dts)


def bench_cpu_torch_baseline(n_steps: int = 3) -> float:
    """Reference-equivalent PyTorch CPU train step, sentences/sec."""
    import torch
    import transformers

    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig()  # bert-base geometry
    encoder = transformers.BertModel(hf_cfg)
    dec_cfg = transformers.BertConfig(is_decoder=True, add_cross_attention=True)
    decoder = transformers.BertLMHeadModel(dec_cfg)

    n_e, e_dim, beta = 9, 768, 0.69
    codebook = torch.nn.Embedding(n_e, e_dim)
    codebook.weight.data.uniform_(-1.0 / n_e, 1.0 / n_e)

    params = (
        list(encoder.parameters()) + list(decoder.parameters()) + list(codebook.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-4, amsgrad=True)

    ids_np, mask_np = _example_batch(batch=BASELINE_BATCH)
    ids = torch.as_tensor(ids_np.astype(np.int64))
    mask = torch.as_tensor(mask_np.astype(np.int64))

    def step():
        z = encoder(ids, attention_mask=mask).last_hidden_state
        zf = z.reshape(-1, e_dim)
        d = (
            zf.pow(2).sum(1, keepdim=True)
            + codebook.weight.pow(2).sum(1)
            - 2 * zf @ codebook.weight.t()
        )
        idx = torch.argmin(d, dim=1)
        zq = codebook.weight[idx].reshape(z.shape)
        vq_loss = torch.mean((zq.detach() - z) ** 2) + beta * torch.mean((zq - z.detach()) ** 2)
        zq = z + (zq - z).detach()
        logits = decoder(
            input_ids=ids, attention_mask=mask, encoder_hidden_states=zq
        ).logits
        logp = torch.log_softmax(logits.reshape(-1, VOCAB), dim=-1)
        recon = -logp.gather(1, ids.reshape(-1, 1)).mean()
        loss = recon + vq_loss
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = (time.perf_counter() - t0) / n_steps
    return BASELINE_BATCH / dt


def get_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["cpu_torch_train_sentences_per_sec"]
    value = bench_cpu_torch_baseline()
    with open(BASELINE_FILE, "w") as f:
        json.dump(
            {
                "cpu_torch_train_sentences_per_sec": value,
                "config": "shelgon3-VQ bert-base batch=256 seq=12 n_e=9 (reference-equivalent torch CPU; sentences/sec is batch-insensitive on CPU)",
            },
            f,
            indent=2,
        )
    return value


def main():
    tpu = bench_tpu_train()
    baseline = get_baseline()
    print(
        json.dumps(
            {
                "metric": "shelgon3_vq_train_sentences_per_sec_per_chip",
                "value": round(tpu, 1),
                "unit": "sentences/sec",
                "vs_baseline": round(tpu / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
