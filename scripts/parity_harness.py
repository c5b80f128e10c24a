"""Quality-parity harness: this framework vs a torch reference-equivalent.

Trains the SAME tiny Bagon architecture (HF BertModel + BertLMHeadModel
built from config — the reference's exact module stack) and this framework's
Flax Bagon on IDENTICAL pre-tokenized data (same corpus, same seed-69
split, same batch schedule, same loss form, same Adam hyperparameters), then
compares validation token accuracy. This is the measured stand-in for the
reference's unpublished quality numbers (SURVEY §6): both implementations
must reach equivalent reconstruction accuracy.

    python scripts/parity_harness.py [--epochs 2] [--json-out path]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HIDDEN, LAYERS, HEADS, FFN = 128, 2, 2, 256
BATCH = 64
LR = 1e-3
SEQ = 12


def _data():
    from kindergarten_vq_vae_tpu.data.dataset import DSentences, split_dataset
    from kindergarten_vq_vae_tpu.data.generate import generate_dsentences
    from kindergarten_vq_vae_tpu.data.prepare import (
        clean_dataset,
        export_vocab,
        labels_to_one_hot,
        tokenize_corpus,
    )
    from kindergarten_vq_vae_tpu.data.tokenizer import WordTokenizer

    sentences, labels = generate_dsentences(num_verbs=3, num_objects=3)
    one_hot = labels_to_one_hot(labels)
    sc, lc, ohc, _ = clean_dataset(sentences, labels, one_hot)
    tok = WordTokenizer(export_vocab(sc))
    ids, mask = tokenize_corpus(sc, tok, SEQ)
    ds = DSentences(input_ids=ids, attention_mask=mask, labels=lc, one_hot=ohc, sentences=sc)
    train, val, _ = split_dataset(ds)
    return train, val, tok.vocab_size


def _batches(split, epochs, seed=0):
    """Shared deterministic batch schedule for both frameworks."""
    n = len(split)
    for epoch in range(epochs):
        order = np.random.default_rng((seed, epoch)).permutation(n)
        for b in range(n // BATCH):
            idx = order[b * BATCH : (b + 1) * BATCH]
            yield split.input_ids[idx], split.attention_mask[idx]


def train_torch(train, val, vocab_size, epochs) -> float:
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.BertConfig(
        vocab_size=vocab_size, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=FFN,
    )
    dec_cfg = transformers.BertConfig(
        vocab_size=vocab_size, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=FFN,
        is_decoder=True, add_cross_attention=True,
    )
    encoder = transformers.BertModel(cfg)
    decoder = transformers.BertLMHeadModel(dec_cfg)
    opt = torch.optim.Adam(
        list(encoder.parameters()) + list(decoder.parameters()), lr=LR, amsgrad=True
    )

    encoder.train(); decoder.train()
    for ids_np, mask_np in _batches(train, epochs):
        ids = torch.as_tensor(ids_np.astype(np.int64))
        mask = torch.as_tensor(mask_np.astype(np.int64))
        h = encoder(ids, attention_mask=mask).last_hidden_state
        logits = decoder(input_ids=ids, attention_mask=mask, encoder_hidden_states=h).logits
        logp = torch.log_softmax(logits.reshape(-1, vocab_size), dim=-1)
        loss = -logp.gather(1, ids.reshape(-1, 1)).mean()
        opt.zero_grad(); loss.backward(); opt.step()

    encoder.eval(); decoder.eval()
    correct = total = 0
    with torch.no_grad():
        for b in range(len(val) // BATCH):
            ids = torch.as_tensor(val.input_ids[b * BATCH : (b + 1) * BATCH].astype(np.int64))
            mask = torch.as_tensor(val.attention_mask[b * BATCH : (b + 1) * BATCH].astype(np.int64))
            h = encoder(ids, attention_mask=mask).last_hidden_state
            logits = decoder(input_ids=ids, attention_mask=mask, encoder_hidden_states=h).logits
            recon = logits.argmax(-1)
            correct += int((recon == ids).sum())
            total += ids.numel()
    return correct / total


def train_ours(train, val, vocab_size, epochs) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.losses import kl_recon_loss
    from kindergarten_vq_vae_tpu.train.optim import make_optimizer
    from kindergarten_vq_vae_tpu.train.variants import build_model, init_params

    cfg = RunConfig(
        model=ModelConfig(
            model_name="bagon", vocab_size=vocab_size, hidden_size=HIDDEN,
            num_layers=LAYERS, num_heads=HEADS, intermediate_size=FFN,
            compute_dtype="float32",
        ),
        data=DataConfig(batch_size=BATCH, tokenized_sentence_max_length=SEQ),
        optim=__import__("kindergarten_vq_vae_tpu.train.config", fromlist=["OptimConfig"]).OptimConfig(lr=LR),
    )
    model = build_model(cfg)
    params = init_params(cfg, jax.random.key(0))
    tx = make_optimizer(cfg.optim)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids, mask, i):
        key = jax.random.fold_in(jax.random.key(1), i)
        k1, k2 = jax.random.split(key)

        def loss_fn(p):
            out = model.apply({"params": p}, ids, mask, ids, mask,
                              deterministic=False, rngs={"dropout": k1, "gumbel": k2})
            valid = jnp.ones((ids.shape[0],), jnp.float32)
            return kl_recon_loss(out["logits"], ids, valid)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i, (ids_np, mask_np) in enumerate(_batches(train, epochs)):
        params, opt_state, _ = step(params, opt_state, jnp.asarray(ids_np), jnp.asarray(mask_np), i)

    @jax.jit
    def evaluate(params, ids, mask):
        out = model.apply({"params": params}, ids, mask, ids, mask, deterministic=True)
        recon = jnp.argmax(out["logits"], axis=-1)
        return jnp.sum(recon == ids), ids.size

    correct = total = 0
    for b in range(len(val) // BATCH):
        ids = jnp.asarray(val.input_ids[b * BATCH : (b + 1) * BATCH])
        mask = jnp.asarray(val.attention_mask[b * BATCH : (b + 1) * BATCH])
        c, t = evaluate(params, ids, mask)
        correct += int(c)
        total += int(t)
    return correct / total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    train, val, vocab = _data()
    print(f"corpus: {len(train)} train / {len(val)} val, vocab {vocab}")

    t0 = time.perf_counter()
    acc_ours = train_ours(train, val, vocab, args.epochs)
    t_ours = time.perf_counter() - t0
    print(f"ours  : val token acc {acc_ours:.4f}  ({t_ours:.1f}s)")

    t0 = time.perf_counter()
    acc_torch = train_torch(train, val, vocab, args.epochs)
    t_torch = time.perf_counter() - t0
    print(f"torch : val token acc {acc_torch:.4f}  ({t_torch:.1f}s)")

    result = {
        "epochs": args.epochs,
        "ours_val_token_acc": acc_ours,
        "torch_val_token_acc": acc_torch,
        "acc_gap": acc_ours - acc_torch,
        "ours_seconds": t_ours,
        "torch_seconds": t_torch,
    }
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)
    assert acc_ours >= acc_torch - 0.02, "quality parity violated"


if __name__ == "__main__":
    main()
