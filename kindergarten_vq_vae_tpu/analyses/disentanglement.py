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
from kindergarten_vq_vae_tpu.utils.consts import CLEAN_FACTOR_NAMES


def factor_code_metrics(codes, mask, labels, n_e, factor_names=CLEAN_FACTOR_NAMES):
    """Quantitative factor<->code disentanglement (the reference only eyeballs
    word histograms, unsupervised_vq_disentanglement.py:209-235 — this emits
    numbers for the same checkpoint).

    Treat each token POSITION as a latent dimension whose value is the
    assigned codebook index. For every generative factor f and position s,
    compute the mutual information I(label_f ; code_s) over sentences whose
    attention mask covers s, normalized by H(label_f). Report per factor:

    - ``nmi``: max_s I/H        (1.0 = some position's code determines f)
    - ``position``: the argmax s
    - ``gap``: (I_top - I_second)/H over positions — MIG-style: high when ONE
      position encodes the factor rather than it being smeared everywhere
    - ``purity``: token-level majority-vote accuracy of predicting f from the
      code alone, sum_k P(k) max_v P(v|k), with the majority-class
      ``baseline`` for reference (purity <= baseline means codes carry
      nothing about f).

    codes (N, S) int; mask (N, S) 0/1; labels (N, F) int. Pure numpy — runs
    on the host after the batched jit inference collected the codes.
    """
    codes = np.asarray(codes)
    mask = np.asarray(mask).astype(bool)
    labels = np.asarray(labels)
    n, s = codes.shape
    out = {}
    for f in range(labels.shape[1]):
        lab = labels[:, f]
        vals = np.unique(lab)
        p_v = np.array([(lab == v).mean() for v in vals])
        h_f = float(-(p_v * np.log(np.maximum(p_v, 1e-12))).sum())
        name = factor_names[f] if f < len(factor_names) else f"factor_{f}"
        if h_f <= 1e-12:  # constant factor: nothing to disentangle
            out[name] = {"nmi": 0.0, "position": -1, "gap": 0.0,
                         "purity": 1.0, "baseline": 1.0, "entropy": 0.0}
            continue
        mis = np.zeros(s)
        for pos in range(s):
            keep = mask[:, pos]
            if keep.sum() < 2:
                continue
            c, l = codes[keep, pos], lab[keep]
            joint = np.zeros((n_e, len(vals)))
            for vi, v in enumerate(vals):
                joint[:, vi] = np.bincount(c[l == v], minlength=n_e)
            joint /= max(joint.sum(), 1.0)
            pc = joint.sum(1, keepdims=True)
            pl = joint.sum(0, keepdims=True)
            nz = joint > 0
            mis[pos] = float((joint[nz] * np.log(joint[nz] / (pc @ pl)[nz])).sum())
        order = np.argsort(mis)[::-1]
        top, second = mis[order[0]], (mis[order[1]] if s > 1 else 0.0)
        # token-level purity: majority-vote factor value per code
        keep = mask.reshape(-1)
        c_all = codes.reshape(-1)[keep]
        l_all = np.repeat(lab[:, None], s, axis=1).reshape(-1)[keep]
        joint = np.zeros((n_e, len(vals)))
        for vi, v in enumerate(vals):
            joint[:, vi] = np.bincount(c_all[l_all == v], minlength=n_e)
        tot = max(joint.sum(), 1.0)
        purity = float(joint.max(1).sum() / tot)
        baseline = float(joint.sum(0).max() / tot)
        out[name] = {
            "nmi": float(top / h_f),
            "position": int(order[0]),
            "gap": float((top - second) / h_f),
            "purity": purity,
            "baseline": baseline,
            "entropy": h_f,
        }
    return out


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
    all_codes, all_masks, all_labels = [], [], []

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
            if ds.labels is not None:
                all_codes.append(codes)
                all_masks.append(np.asarray(mask[:m]))
                all_labels.append(np.asarray(ds.labels[sl]))

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
    factor_metrics = (
        factor_code_metrics(
            np.concatenate(all_codes), np.concatenate(all_masks),
            np.concatenate(all_labels), n_e,
        )
        if all_codes
        else None
    )

    if results_dir is not None:
        os.makedirs(results_dir, exist_ok=True)
        with open(os.path.join(results_dir, "dSentences_vq_vector_populated.txt"), "w") as f:
            f.write(f"the following VQ latent vectors were populated: {sorted(seen_codes)}")
        with open(os.path.join(results_dir, "dSentences_words_of_interest_histograms.json"), "w") as f:
            json.dump(histograms, f)
        with open(os.path.join(results_dir, "dSentences_vq_words_distrib.json"), "w") as f:
            json.dump(code_words_out, f)
        if factor_metrics is not None:
            with open(os.path.join(results_dir, "dSentences_vq_factor_metrics.json"), "w") as f:
                json.dump(factor_metrics, f, indent=1)

    return sorted(seen_codes), histograms, code_words_out, factor_metrics


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
    codes, histograms, code_words, metrics = unsupervised_vq_disentanglement(
        cfg, model, params, splits, tokenizer,
        results_dir=results_dir, lim_batches_pct=args.lim_batches_pct,
        batch_size=args.batch_size,
    )
    print(f"populated codes: {codes}")
    if metrics is not None:
        for name, m in metrics.items():
            print(
                f"  {name}: nmi={m['nmi']:.3f}@pos{m['position']} "
                f"gap={m['gap']:.3f} purity={m['purity']:.3f} "
                f"(baseline {m['baseline']:.3f})"
            )
    print(f"results -> {results_dir}")


if __name__ == "__main__":
    _main()
