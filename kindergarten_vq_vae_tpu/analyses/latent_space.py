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
