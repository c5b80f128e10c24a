"""Latent-space scatter visualization.

Reference: analyses/latent_space_visualization/latent_space_visualization.py
— filter sentence latent representations to hand-picked class combinations,
min-max scale dims 0/1, scatter-plot colored by combination.
"""

from __future__ import annotations

import os

import numpy as np



from kindergarten_vq_vae_tpu.utils.compile import tpu_jit as _tpu_jit


def compute_sentence_latents(model, params, input_ids, attention_mask, batch_size: int = 512,
                             out_path: str | None = None):
    """Sentence-level latent representations (encoder pooler output) over a
    dataset — the cached ``sentence_latent_reps`` artifact the reference's
    latent-space analysis loads. Batched jit inference."""
    import jax
    import jax.numpy as jnp

    from kindergarten_vq_vae_tpu.nn.bert import BertModel

    enc_cfg = model.enc_cfg

    def _encode(enc_params, ids, mask):
        out = BertModel(enc_cfg).apply(
            {"params": enc_params}, ids, attention_mask=mask, deterministic=True
        )
        return out["pooler_output"]

    encode = _tpu_jit(_encode, params["encoder"])

    n = len(input_ids)
    chunks = []
    for b in range(-(-n // batch_size)):
        sl = slice(b * batch_size, (b + 1) * batch_size)
        ids, mask = input_ids[sl], attention_mask[sl]
        m = len(ids)
        if m == 0:
            continue
        if m < batch_size:
            pad = batch_size - m
            ids = np.concatenate([ids, np.repeat(ids[:1], pad, axis=0)])
            mask = np.concatenate([mask, np.repeat(mask[:1], pad, axis=0)])
        chunks.append(np.asarray(encode(jnp.asarray(ids), jnp.asarray(mask)))[:m])
    latents = np.concatenate(chunks)
    if out_path is not None:
        np.save(out_path, latents)
    return latents


def _minmax(x):
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo + 1e-12)


def latent_space_visualization(
    latents: np.ndarray,
    labels: np.ndarray,
    class_combos: list[tuple],
    out_path: str | None = None,
    dims: tuple[int, int] = (0, 1),
):
    """``latents`` (N, D); ``labels`` (N, F); ``class_combos`` a list of
    label tuples to keep. Returns the plotted points per combo; writes a PNG
    when matplotlib is available and out_path given."""
    points = {}
    for combo in class_combos:
        sel = np.all(labels == np.asarray(combo), axis=1)
        if sel.any():
            pts = latents[sel][:, list(dims)]
            points[combo] = np.stack([_minmax(pts[:, 0]), _minmax(pts[:, 1])], axis=1)

    if out_path is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(5, 4))
            for combo, pts in points.items():
                ax.scatter(pts[:, 0], pts[:, 1], s=8, label=str(combo), alpha=0.7)
            ax.legend(fontsize=6)
            ax.set_title("sentence latent space")
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            fig.savefig(out_path, dpi=120, bbox_inches="tight")
            plt.close(fig)
        except ImportError:
            pass
    return points


def _main():
    """Run-dir script contract of the reference
    (analyses/latent_space_visualization/latent_space_visualization.py):
    compute (or load cached) sentence latent reps, filter to class
    combinations, min-max scale dims, scatter-plot to PNG."""
    import argparse
    import json

    from kindergarten_vq_vae_tpu.analyses.common import load_run
    from kindergarten_vq_vae_tpu.train.run import load_data

    p = argparse.ArgumentParser(description="latent-space scatter visualization")
    p.add_argument("run_dir")
    p.add_argument("--split", default="test", choices=("train", "val", "test"))
    p.add_argument("--combos", default=None,
                   help="JSON list of 5-factor label tuples to plot; default: "
                        "the 8 most frequent combinations (the reference "
                        "hand-picks 8, latent_space_visualization.py)")
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--dims", default="0,1")
    args = p.parse_args()

    cfg, model, params = load_run(args.run_dir)
    splits, _ = load_data(cfg)
    split = splits[args.split]
    ids = np.asarray(split.input_ids)
    mask = np.asarray(split.attention_mask)
    labels = np.asarray(split.labels)

    cache = os.path.join(args.run_dir, f"sentence_latent_reps_{args.split}.npy")
    if os.path.exists(cache):
        latents = np.load(cache)
    else:
        latents = compute_sentence_latents(
            model, params, ids, mask, batch_size=args.batch_size, out_path=cache
        )

    if args.combos:
        combos = [tuple(c) for c in json.loads(args.combos)]
    else:
        uniq, counts = np.unique(labels, axis=0, return_counts=True)
        combos = [tuple(int(v) for v in row) for row in uniq[np.argsort(-counts)][:8]]

    dims = tuple(int(d) for d in args.dims.split(","))
    out_png = os.path.join(args.run_dir, "latent_space_visualization.png")
    points = latent_space_visualization(latents, labels, combos, out_path=out_png, dims=dims)
    print(f"{len(points)} combos plotted -> {out_png} (latents cached at {cache})")


if __name__ == "__main__":
    _main()
