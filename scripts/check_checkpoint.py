"""Checkpoint validity smoke check.

Reference: common/test_checkpoint_validity.py — load a run's checkpoint,
rebuild the model from its run_conf.json, run a 3-sentence forward, print
the reconstructions. Unlike the reference's stale copy (SURVEY §2.9.7),
this reconstructs from the run-dir contract so it can't drift.

    python scripts/check_checkpoint.py <run_dir> [ckpt_name]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    run_dir = sys.argv[1]
    ckpt = sys.argv[2] if len(sys.argv) > 2 else None

    from kindergarten_vq_vae_tpu.analyses.common import load_run
    from kindergarten_vq_vae_tpu.data.tokenizer import _BaseTokenizer

    cfg, model, params = load_run(run_dir, ckpt)
    tok_path = os.path.join(cfg.data.data_dir, cfg.data.tokenizer_file)
    tokenizer = _BaseTokenizer.load(tok_path) if os.path.exists(tok_path) else None

    sentences = [
        "i eat the apple",
        "he is not buying the mango",
        "will you be building the chair",
    ]
    L = cfg.data.tokenized_sentence_max_length
    if tokenizer is not None:
        ids, mask = tokenizer.encode_batch(sentences, L)
    else:
        rng = np.random.default_rng(0)
        ids = rng.integers(1, cfg.model.vocab_size, (3, L)).astype(np.int32)
        mask = np.ones((3, L), np.int32)

    name = cfg.model.model_name
    kwargs = dict(deterministic=True, rngs={"gumbel": jax.random.key(0)})
    if name in ("bagon", "shelgon"):
        out = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                          jnp.asarray(ids), jnp.asarray(mask), **kwargs)
    elif name == "shelgon3":
        out = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                          is_training=False, **kwargs)
    else:
        out = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask), **kwargs)

    recon_ids = np.asarray(jnp.argmax(out["logits"], axis=-1))
    print(f"checkpoint OK: {name}, logits {out['logits'].shape}")
    for i, s in enumerate(sentences):
        recon = tokenizer.decode(recon_ids[i]) if tokenizer else str(recon_ids[i])
        print(f"  {s!r} -> {recon!r}")


if __name__ == "__main__":
    main()
