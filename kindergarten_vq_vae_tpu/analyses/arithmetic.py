"""Latent arithmetic: factor-direction vectors added at three injection points.

Reference (analyses/latent_arithmetics/):
- ``latent_arithmetics_Shelgon_latent_conditioning.py``: Δ between
  factor-opposite groups in the post-proj_out conditioning space (:144,180).
- ``latent_arithmetics_Shelgon_latent_sentence.py``: Δ in the raw encoder
  output space, before proj_in (:136,168,186-193).
- ``latent_arithmetics_Bagon.py``: Δ directly on Bagon encoder outputs
  (:96,119).

All three reduce to: encode two groups, Δ = mean(A) − mean(B), add Δ to
held-out latents, decode — pure batched jit programs here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kindergarten_vq_vae_tpu.nn.bert import BertLMHeadModel, BertModel
from kindergarten_vq_vae_tpu.ops.gumbel import gumbel_softmax


def _decode_ids(tokenizer, ids):
    return tokenizer.batch_decode(np.asarray(ids)) if tokenizer is not None else None


def masked_decoder_inputs(tokenizer, input_ids, attention_mask):
    """All-[MASK] decoder inputs (padding preserved). Beyond-reference knob:
    the reference's arithmetic scripts teacher-force the decoder with the
    CLEAN target ids (latent_arithmetics_Bagon.py:119), so any model accurate
    on clean inputs reproduces them verbatim and latent edits are invisible
    (measured, RESULTS.md round 3). Masking every visible position forces the
    reconstruction through cross-attention to the (edited) latent."""
    from kindergarten_vq_vae_tpu.data.tokenizer import MASK

    ids = np.asarray(input_ids)
    return np.where(np.asarray(attention_mask) == 1, tokenizer.vocab[MASK], ids)


def randomized_decoder_inputs(tokenizer, input_ids, attention_mask, pct=0.9, seed=0):
    """Decoder inputs corrupted the way corruption-trained models saw them:
    ``replace_pct_rand_values`` with uniform-random vocab tokens (the engine's
    own `decoder_perturb_train_pct` mechanism, utils/tensor.py). All-[MASK]
    inputs are out-of-distribution for those models (training never used the
    MASK token); random-token corruption at the training pct is the
    in-distribution way to disable the copy path at analysis time."""
    import jax

    from kindergarten_vq_vae_tpu.utils.tensor import replace_pct_rand_values

    ids = np.asarray(input_ids)
    corrupted = replace_pct_rand_values(
        jax.random.key(seed), jnp.asarray(ids), float(pct), 0, tokenizer.vocab_size
    )
    return np.where(np.asarray(attention_mask) == 1, np.asarray(corrupted), ids)


# jitted forwards, cached per model/config: a fresh closure per call would
# defeat jax.jit's cache and recompile the identical program on every call
# (three _shelgon_conditioning calls per arithmetic run — minutes each at
# flagship scale through the remote-compile service)
_JIT_CACHE: dict = {}


def _cached_jit(key, make_fn):
    fn = _JIT_CACHE.get(key)
    if fn is None:
        from kindergarten_vq_vae_tpu.utils.compile import tpu_compiler_options

        fn = _JIT_CACHE[key] = jax.jit(make_fn(), compiler_options=tpu_compiler_options())
    return fn


def _shelgon_conditioning(model, params, input_ids, attention_mask):
    # params is a jit ARGUMENT, never a closure (closed-over param trees
    # lower to HLO constants and blow the remote-compile payload limit,
    # CLAUDE.md); eager apply additionally pays per-op tunnel dispatch
    def make():
        def _fwd(p, ids, mask):
            out = model.apply(
                {"params": p}, ids, mask, ids, mask,
                deterministic=True, rngs={"gumbel": jax.random.key(0)},
            )
            return out["conditioning"], out["encoder_last_hidden_state"]

        return _fwd

    fn = _cached_jit(("cond", id(model)), make)
    return fn(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))


def _decoder_apply(dec_cfg, dec_params, ids, mask, hidden):
    def make():
        def _fwd(p, ids_, mask_, h):
            out = BertLMHeadModel(dec_cfg).apply(
                {"params": p}, ids_, mask_, encoder_hidden_states=h, deterministic=True,
            )
            return jnp.argmax(out["logits"], axis=-1)

        return _fwd

    fn = _cached_jit(("dec", dec_cfg), make)
    return fn(dec_params, jnp.asarray(ids), jnp.asarray(mask), hidden)


def latent_arithmetic_shelgon_conditioning(
    model, params, group_a, group_b, targets, tokenizer=None, decoder_input_ids=None
):
    """Δ in the conditioning (post-proj_out) space. group_a/group_b/targets
    are dicts with input_ids + attention_mask. ``decoder_input_ids`` overrides
    the teacher-forced decoder inputs (see ``masked_decoder_inputs``)."""
    cond_a, _ = _shelgon_conditioning(model, params, **group_a)
    cond_b, _ = _shelgon_conditioning(model, params, **group_b)
    delta = jnp.mean(cond_a, axis=0) - jnp.mean(cond_b, axis=0)

    dec_ids = targets["input_ids"] if decoder_input_ids is None else decoder_input_ids
    cond_t, _ = _shelgon_conditioning(model, params, **targets)
    recon = _decoder_apply(
        model.dec_cfg, params["decoder"], dec_ids, targets["attention_mask"], cond_t + delta
    )
    base = _decoder_apply(
        model.dec_cfg, params["decoder"], dec_ids, targets["attention_mask"], cond_t
    )
    return {
        "delta": np.asarray(delta),
        "base_recon_ids": np.asarray(base),
        "shifted_recon_ids": np.asarray(recon),
        "base_recon": _decode_ids(tokenizer, base),
        "shifted_recon": _decode_ids(tokenizer, recon),
    }


def _shelgon_bottleneck(model, params, h):
    """proj_in -> gumbel -> proj_out on raw encoder states (the model's own
    bottleneck math, applied to externally modified latents)."""
    p = params
    x = h @ p["proj_in_dense"]["kernel"] + p["proj_in_dense"]["bias"]
    logits = jnp.einsum("bsl,cs->bcl", x, p["proj_in_conv_kernel"]) + p["proj_in_conv_bias"][None, :, None]
    classes = gumbel_softmax(jax.random.key(0), logits, tau=1.0, hard=False, axis=-1)
    y = jnp.einsum("bcl,sc->bsl", classes, p["proj_out_conv_kernel"]) + p["proj_out_conv_bias"][None, :, None]
    return y @ p["proj_out_dense"]["kernel"] + p["proj_out_dense"]["bias"]


def latent_arithmetic_shelgon_sentence(
    model, params, group_a, group_b, targets, tokenizer=None, decoder_input_ids=None
):
    """Δ in the raw encoder-output space, pushed through the bottleneck."""
    _, h_a = _shelgon_conditioning(model, params, **group_a)
    _, h_b = _shelgon_conditioning(model, params, **group_b)
    delta = jnp.mean(h_a, axis=0) - jnp.mean(h_b, axis=0)

    dec_ids = targets["input_ids"] if decoder_input_ids is None else decoder_input_ids
    _, h_t = _shelgon_conditioning(model, params, **targets)
    cond_shift = _shelgon_bottleneck(model, params, h_t + delta)
    cond_base = _shelgon_bottleneck(model, params, h_t)
    shifted = _decoder_apply(model.dec_cfg, params["decoder"], dec_ids, targets["attention_mask"], cond_shift)
    base = _decoder_apply(model.dec_cfg, params["decoder"], dec_ids, targets["attention_mask"], cond_base)
    return {
        "delta": np.asarray(delta),
        "base_recon_ids": np.asarray(base),
        "shifted_recon_ids": np.asarray(shifted),
        "base_recon": _decode_ids(tokenizer, base),
        "shifted_recon": _decode_ids(tokenizer, shifted),
    }


def latent_arithmetic_bagon(
    model, params, group_a, group_b, targets, tokenizer=None, decoder_input_ids=None
):
    """Δ directly in Bagon encoder space (latent_arithmetics_Bagon.py:96,119)."""
    def make():
        def _enc(p, ids, mask):
            out = BertModel(model.enc_cfg).apply(
                {"params": p}, ids, attention_mask=mask, deterministic=True,
            )
            return out["last_hidden_state"]

        return _enc

    enc_fn = _cached_jit(("enc", model.enc_cfg), make)

    def encode(d):
        return enc_fn(
            params["encoder"], jnp.asarray(d["input_ids"]), jnp.asarray(d["attention_mask"])
        )

    dec_ids = targets["input_ids"] if decoder_input_ids is None else decoder_input_ids
    h_a, h_b, h_t = encode(group_a), encode(group_b), encode(targets)
    delta = jnp.mean(h_a, axis=0) - jnp.mean(h_b, axis=0)
    shifted = _decoder_apply(model.dec_cfg, params["decoder"], dec_ids, targets["attention_mask"], h_t + delta)
    base = _decoder_apply(model.dec_cfg, params["decoder"], dec_ids, targets["attention_mask"], h_t)
    return {
        "delta": np.asarray(delta),
        "base_recon_ids": np.asarray(base),
        "shifted_recon_ids": np.asarray(shifted),
        "base_recon": _decode_ids(tokenizer, base),
        "shifted_recon": _decode_ids(tokenizer, shifted),
    }


def _factor_groups(split, factor: str, value_a: str, value_b: str, n: int):
    """Two sentence groups from a split, selected by an explicit factor value
    (the reference builds its Δ from factor-opposite train sentences, e.g.
    negative vs affirmative, latent_arithmetics_...conditioning.py:104-142)."""
    from kindergarten_vq_vae_tpu.utils.consts import EXPLICIT_FACTOR_VALUES

    names = list(EXPLICIT_FACTOR_VALUES)
    col = names.index(factor)
    values = EXPLICIT_FACTOR_VALUES[factor]
    labels = np.asarray(split.labels)

    def pick(value):
        idx = np.where(labels[:, col] == values.index(value))[0][:n]
        if len(idx) == 0:
            raise ValueError(f"no sentences with {factor}={value}")
        return {
            "input_ids": np.asarray(split.input_ids)[idx],
            "attention_mask": np.asarray(split.attention_mask)[idx],
        }

    return pick(value_a), pick(value_b)


def _main():
    """Run-dir script contract of the reference's three latent-arithmetic
    scripts (analyses/latent_arithmetics/): Δ = mean(group A) − mean(group B)
    computed on train sentences, added to held-out latents at one of three
    injection points, reconstructions printed."""
    import argparse
    import json
    import os

    from kindergarten_vq_vae_tpu.analyses.common import load_run
    from kindergarten_vq_vae_tpu.train.run import load_data

    p = argparse.ArgumentParser(description="latent arithmetic (conditioning | sentence | bagon)")
    p.add_argument("run_dir")
    p.add_argument("--mode", default="bagon",
                   choices=("conditioning", "sentence", "bagon"),
                   help="injection point (the three reference scripts)")
    p.add_argument("--factor", default="verb_tense",
                   help="explicit factor, e.g. verb_tense (the reference's "
                        "Bagon example, latent_arithmetics_Bagon.py:26-34)")
    p.add_argument("--a", default="present", help="factor value of group A")
    p.add_argument("--b", default="past", help="factor value of group B")
    p.add_argument("--n", type=int, default=64, help="sentences per group / targets")
    p.add_argument("--dec-input", default="clean", choices=("clean", "mask", "rand"),
                   help="decoder teacher-forcing inputs: 'clean' = the target ids "
                        "(the reference's design), 'mask' = all-[MASK], or 'rand' = "
                        "random-token corruption at --dec-rand-pct (the engine's own "
                        "training corruption; in-distribution for corruption-trained "
                        "models). Both non-clean modes force the reconstruction "
                        "through cross-attention so latent edits are visible "
                        "(beyond-reference)")
    p.add_argument("--dec-rand-pct", type=float, default=0.9)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    cfg, model, params = load_run(args.run_dir)
    splits, tokenizer = load_data(cfg)
    group_a, group_b = _factor_groups(splits["train"], args.factor, args.a, args.b, args.n)
    # targets: held-out sentences from group B's factor value (the Δ should
    # flip them toward A), drawn from the val split
    targets, _ = _factor_groups(splits["val"], args.factor, args.b, args.a, args.n)

    dec_ids = None
    if args.dec_input == "mask":
        dec_ids = masked_decoder_inputs(tokenizer, targets["input_ids"], targets["attention_mask"])
    elif args.dec_input == "rand":
        dec_ids = randomized_decoder_inputs(
            tokenizer, targets["input_ids"], targets["attention_mask"], pct=args.dec_rand_pct
        )

    fn = {
        "conditioning": latent_arithmetic_shelgon_conditioning,
        "sentence": latent_arithmetic_shelgon_sentence,
        "bagon": latent_arithmetic_bagon,
    }[args.mode]
    res = fn(model, params, group_a, group_b, targets, tokenizer, decoder_input_ids=dec_ids)

    for base, shifted in zip(res.get("base_recon") or [], res.get("shifted_recon") or []):
        print(f"base   : {base}\nshifted: {shifted}\n")
    out = args.out or os.path.join(args.run_dir, f"latent_arithmetic_{args.mode}.json")
    dump = {k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in res.items()}
    with open(out, "w") as f:
        json.dump(dump, f)
    print(f"results -> {out}")


if __name__ == "__main__":
    _main()
