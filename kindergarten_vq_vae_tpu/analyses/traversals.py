"""Latent traversals for the Shelgon latent-class bottleneck.

Reference: analyses/latent_traversals/latent_traversals_Shelgon_latent_classes.py:
encode sentences, REPLACE the (num_classes, num_labels) latent one-hot with a
hand-written matrix (:130-138), decode through proj_out + decoder, and
compare original vs modified reconstructions.

Runs as one jitted batch inference via the model's
``override_latent_classes`` hook (models/shelgon.py) — the traversal matrix
broadcasts over the whole batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np



from kindergarten_vq_vae_tpu.utils.compile import tpu_jit as _tpu_jit


def filter_by_factor(decoded_df, factor_name: str, factor_value: str, acc_threshold: float = 0.999):
    """Max-accuracy sentences with a given explicit factor value — the input
    selection of the traversal scripts (ref latent_traversals_...py:99-118
    re-encodes max-acc sentences filtered by factor)."""
    df = decoded_df[decoded_df.sentence_acc > acc_threshold]
    return df[df[factor_name] == factor_value].reset_index(drop=True)


def latent_traversals_shelgon(
    model,
    params,
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    override_matrix: np.ndarray,
    tokenizer=None,
    decoder_input_ids=None,
):
    """``override_matrix``: (num_latent_classes, num_labels_per_class) or a
    (B, C, L) per-sentence batch. Returns dict with original + traversed
    reconstructions (decoded when a tokenizer is given). ``decoder_input_ids``
    overrides the teacher-forced decoder inputs (e.g. all-[MASK] via
    ``analyses.arithmetic.masked_decoder_inputs`` — the reference feeds the
    clean target ids, so traversals are invisible on any model accurate on
    clean inputs; measured, RESULTS.md round 3)."""
    ids = jnp.asarray(input_ids)
    mask = jnp.asarray(attention_mask)
    dec_ids = ids if decoder_input_ids is None else jnp.asarray(decoder_input_ids)

    def _run(p, ids_, mask_, dec_ids_, override):
        out = model.apply(
            {"params": p}, ids_, mask_, dec_ids_, mask_,
            deterministic=True,
            override_latent_classes=override,
            rngs={"gumbel": jax.random.key(0)},
        )
        return jnp.argmax(out["logits"], axis=-1), out["pred_latent_classes"]

    def _run_plain(p, ids_, mask_, dec_ids_):
        out = model.apply(
            {"params": p}, ids_, mask_, dec_ids_, mask_,
            deterministic=True,
            rngs={"gumbel": jax.random.key(0)},
        )
        return jnp.argmax(out["logits"], axis=-1), out["pred_latent_classes"]

    run = _tpu_jit(_run, params, ids, mask, dec_ids)
    run_plain = _tpu_jit(_run_plain, params, ids, mask, dec_ids)

    orig_ids, orig_latents = run_plain()
    override = jnp.asarray(override_matrix, jnp.float32)
    if override.ndim == 2:
        override = jnp.broadcast_to(override, (ids.shape[0], *override.shape))
    trav_ids, _ = run(override)

    result = {
        "original_recon_ids": np.asarray(orig_ids),
        "traversed_recon_ids": np.asarray(trav_ids),
        "original_latent_classes": np.asarray(orig_latents),
    }
    if tokenizer is not None:
        result["original_sentences"] = tokenizer.batch_decode(np.asarray(ids))
        result["original_recon"] = tokenizer.batch_decode(result["original_recon_ids"])
        result["traversed_recon"] = tokenizer.batch_decode(result["traversed_recon_ids"])
    return result


def _main():
    """Run-dir script contract of the reference
    (analyses/latent_traversals/latent_traversals_Shelgon_latent_classes.py):
    pick max-acc sentences (optionally filtered by an explicit factor value),
    re-encode them, override the latent one-hot with a hand-written matrix,
    and print original vs traversed reconstructions."""
    import argparse
    import json
    import os

    from kindergarten_vq_vae_tpu.analyses.common import load_run
    from kindergarten_vq_vae_tpu.train.run import load_data

    p = argparse.ArgumentParser(description="latent traversals (Shelgon latent classes)")
    p.add_argument("run_dir")
    p.add_argument("--factor", default=None, help="explicit factor column, e.g. verb_tense")
    p.add_argument("--value", default=None, help="factor value, e.g. present")
    p.add_argument("--override", default=None,
                   help="JSON (num_classes, num_labels) one-hot matrix or a path "
                        "to a .json holding one; default sets every class to label 0 "
                        "(the reference hand-writes this matrix, ref :130-138)")
    p.add_argument("--n", type=int, default=16, help="max sentences to traverse")
    p.add_argument("--dec-input", default="clean", choices=("clean", "mask", "rand"),
                   help="decoder teacher-forcing inputs: 'clean' = target ids "
                        "(reference design), 'mask' = all-[MASK], 'rand' = "
                        "random-token corruption at --dec-rand-pct (matches the "
                        "training corruption; forces the decode through the "
                        "latent; beyond-reference)")
    p.add_argument("--dec-rand-pct", type=float, default=0.9)
    p.add_argument("--out", default=None, help="write results JSON here")
    args = p.parse_args()

    cfg, model, params = load_run(args.run_dir)
    splits, tokenizer = load_data(cfg)

    # sentence selection: max-acc feather when present (+ factor filter),
    # else the first n test-split sentences
    feather = os.path.join(args.run_dir, "max_acc_sentences.feather")
    sentences = None
    if os.path.exists(feather):
        import pandas as pd

        df = pd.read_feather(feather)
        if args.factor and args.value:
            df = filter_by_factor(df, args.factor, args.value, acc_threshold=-1.0)
        sentences = list(df["input_sentence"])[: args.n]
    if sentences:
        ids, mask = tokenizer.encode_batch(
            sentences, max_length=cfg.data.tokenized_sentence_max_length
        )
    else:
        te = splits["test"]
        ids = np.asarray(te.input_ids[: args.n])
        mask = np.asarray(te.attention_mask[: args.n])

    if args.override:
        raw = args.override
        if os.path.exists(raw):
            with open(raw) as f:
                raw = f.read()
        override = np.asarray(json.loads(raw), np.float32)
    else:
        c, l = cfg.model.num_latent_classes, cfg.model.num_labels_per_class
        override = np.zeros((c, l), np.float32)
        override[:, 0] = 1.0

    dec_ids = None
    if args.dec_input == "mask":
        from kindergarten_vq_vae_tpu.analyses.arithmetic import masked_decoder_inputs

        dec_ids = masked_decoder_inputs(tokenizer, ids, mask)
    elif args.dec_input == "rand":
        from kindergarten_vq_vae_tpu.analyses.arithmetic import randomized_decoder_inputs

        dec_ids = randomized_decoder_inputs(tokenizer, ids, mask, pct=args.dec_rand_pct)

    res = latent_traversals_shelgon(
        model, params, ids, mask, override, tokenizer, decoder_input_ids=dec_ids
    )
    for orig, trav in zip(res.get("original_recon", []), res.get("traversed_recon", [])):
        print(f"orig: {orig}\ntrav: {trav}\n")
    if args.out:
        dump = {k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in res.items()}
        with open(args.out, "w") as f:
            json.dump(dump, f)
        print(f"results -> {args.out}")


if __name__ == "__main__":
    _main()
