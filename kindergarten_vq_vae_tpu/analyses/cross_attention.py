"""Cross-/self-attention extraction + heatmap plotting.

Reference: analyses/cross_attention/extract_model_cross_attention.py (runs
the decoder with ``output_attentions=True`` over batches, averages across
batches then the batch dim, saves both attention kinds — note the reference
saves cross-attentions into BOTH files, SURVEY §2.9.8; fixed here) and
plot_model_cross_attention.py (per-layer/head heatmaps + layer/head means).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np



from kindergarten_vq_vae_tpu.utils.compile import tpu_jit as _tpu_jit


def extract_cross_attention(
    model,
    params,
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    batch_size: int = 256,
    model_kind: str = "auto",
    out_path: str | None = None,
):
    """Mean attention maps over the dataset.

    Returns dict with ``cross_attns`` and ``self_attns``, each
    (layers, heads, S, S) float32. Saves an .npz when ``out_path`` given.
    """
    if model_kind == "auto":
        model_kind = type(model).__name__.lower()

    def _infer(p, ids, mask):
        kwargs = dict(deterministic=True, output_attentions=True,
                      rngs={"gumbel": jax.random.key(0)})
        if model_kind in ("bagon", "shelgon"):
            out = model.apply({"params": p}, ids, mask, ids, mask, **kwargs)
        elif model_kind == "shelgon3":
            out = model.apply({"params": p}, ids, mask, is_training=False, **kwargs)
        else:
            out = model.apply({"params": p}, ids, mask, **kwargs)
        # (layers, B, heads, S, S) -> mean over batch -> (layers, heads, S, S)
        cross = jnp.stack(out["decoder_cross_attentions"]).mean(axis=1)
        self_ = jnp.stack(out["decoder_attentions"]).mean(axis=1)
        return cross, self_

    infer = _tpu_jit(_infer, params)

    n = len(input_ids)
    sums_cross = sums_self = None
    n_batches = 0
    for b in range(-(-n // batch_size)):
        sl = slice(b * batch_size, (b + 1) * batch_size)
        ids, mask = input_ids[sl], attention_mask[sl]
        if len(ids) < batch_size:
            pad = batch_size - len(ids)
            ids = np.concatenate([ids, np.repeat(ids[:1], pad, axis=0)])
            mask = np.concatenate([mask, np.repeat(mask[:1], pad, axis=0)])
        cross, self_ = infer(jnp.asarray(ids), jnp.asarray(mask))
        sums_cross = cross if sums_cross is None else sums_cross + cross
        sums_self = self_ if sums_self is None else sums_self + self_
        n_batches += 1

    result = {
        "cross_attns": np.asarray(sums_cross / n_batches, np.float32),
        "self_attns": np.asarray(sums_self / n_batches, np.float32),
    }
    if out_path is not None:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.savez(out_path, **result)
    return result


def plot_cross_attention(attns: np.ndarray, out_dir: str, prefix: str = "cross_attn"):
    """Heatmaps per layer/head plus layer-mean and head-mean (ref
    plot_model_cross_attention.py:30-99). Skips silently if matplotlib is
    unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return []

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n_layers, n_heads = attns.shape[:2]

    def _save(mat, name, title):
        fig, ax = plt.subplots(figsize=(4, 3.5))
        im = ax.imshow(mat, cmap="viridis", aspect="auto")
        fig.colorbar(im, ax=ax)
        ax.set_title(title)
        ax.set_xlabel("key position")
        ax.set_ylabel("query position")
        path = os.path.join(out_dir, f"{name}.png")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)

    for layer in range(n_layers):
        for head in range(n_heads):
            _save(attns[layer, head], f"{prefix}_l{layer}_h{head}", f"layer {layer} head {head}")
        _save(attns[layer].mean(axis=0), f"{prefix}_l{layer}_headmean", f"layer {layer} (head mean)")
    _save(attns.mean(axis=(0, 1)), f"{prefix}_layerheadmean", "layer+head mean")
    return paths


def _main():
    import argparse

    from kindergarten_vq_vae_tpu.analyses.common import load_run
    from kindergarten_vq_vae_tpu.train.run import load_data

    p = argparse.ArgumentParser(description="cross-attention extraction + heatmaps (ref analyses/cross_attention)")
    p.add_argument("run_dir")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()

    cfg, model, params = load_run(args.run_dir)
    splits, _ = load_data(cfg)
    test = splits["test"]
    out_path = f"{args.run_dir}/attention_maps.npz"
    result = extract_cross_attention(
        model, params, test.input_ids, test.attention_mask,
        batch_size=args.batch_size, model_kind=cfg.model.model_name, out_path=out_path,
    )
    print(f"saved {out_path}: cross {result['cross_attns'].shape}, self {result['self_attns'].shape}")
    if args.plot:
        paths = plot_cross_attention(result["cross_attns"], f"{args.run_dir}/attention_plots")
        print(f"{len(paths)} heatmaps -> {args.run_dir}/attention_plots")


if __name__ == "__main__":
    _main()
