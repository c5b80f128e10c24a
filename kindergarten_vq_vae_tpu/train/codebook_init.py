"""Offline k-means codebook initialization.

Reference: models/shelgon3/vq_codebook_init_weights.py — encode the train
split with a frozen pretrained-Bagon encoder (batch 2048, max_len 12,
:41-67), flatten to (N*S, 768), ``scipy.cluster.vq.kmeans2(minit='points')``
with N_E=9 (:76-85), save the codebook init values (:93-101).

TPU-native: the encoder sweep is batched jit inference and k-means runs
on-device (ops.vq.kmeans_codebook_init) — no per-batch device->host copies,
no scipy. Output is a plain ``.npy`` consumed via
ModelConfig.vq_codebook_init_values_path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kindergarten_vq_vae_tpu.ckpt.checkpoint import restore_checkpoint
from kindergarten_vq_vae_tpu.nn.bert import BertModel
from kindergarten_vq_vae_tpu.ops.vq import kmeans_codebook_init
from kindergarten_vq_vae_tpu.train.config import RunConfig
from kindergarten_vq_vae_tpu.train.variants import bert_configs, init_params


def compute_codebook_init(
    cfg: RunConfig,
    train_split,
    bagon_ckpt_path: str | None = None,
    n_e: int | None = None,
    batch_size: int = 2048,
    out_path: str | None = None,
    seed: int = 0,
    return_diagnostics: bool = False,
):
    """Returns the (n_e, hidden) codebook init array; saves .npy if asked.

    With ``return_diagnostics`` also returns a dict with the encoder-output
    per-element spread and the centroid pairwise distances — the cheap
    detector for the encoder-representation collapse mode (RESULTS.md
    round 3: a collapsed encoder yields pairwise-identical centroids and no
    codebook init can restore utilization downstream)."""
    n_e = n_e or cfg.model.vq_n_e
    enc_cfg, _ = bert_configs(cfg)

    if bagon_ckpt_path is not None:
        bagon_like = RunConfig.from_flat_dict({**cfg.get_config(), "model_name": "bagon"})
        template = init_params(bagon_like, jax.random.key(0))
        enc_params = restore_checkpoint(bagon_ckpt_path, template)["encoder"]
    else:
        bagon_like = RunConfig.from_flat_dict({**cfg.get_config(), "model_name": "bagon"})
        enc_params = init_params(bagon_like, jax.random.key(seed))["encoder"]

    # params as a jit ARGUMENT, never a closure constant: closed-over trees
    # lower to HLO constants and the bert-base encoder (~440 MB) blows the
    # remote-compile payload limit (CLAUDE.md)
    @jax.jit
    def _encode(params, ids, mask):
        out = BertModel(enc_cfg).apply(
            {"params": params}, ids, attention_mask=mask, deterministic=True
        )
        return out["last_hidden_state"]

    enc_params_dev = jax.device_put(enc_params)

    def encode(ids, mask):
        return _encode(enc_params_dev, ids, mask)

    chunks = []
    ids_all = train_split.input_ids
    mask_all = train_split.attention_mask
    n = len(ids_all)
    for b in range(-(-n // batch_size)):
        sl = slice(b * batch_size, (b + 1) * batch_size)
        ids, mask = ids_all[sl], mask_all[sl]
        if len(ids) == 0:
            continue
        if len(ids) < batch_size:
            pad = batch_size - len(ids)
            ids = np.concatenate([ids, np.repeat(ids[:1], pad, axis=0)])
            mask = np.concatenate([mask, np.repeat(mask[:1], pad, axis=0)])
            h = encode(jnp.asarray(ids), jnp.asarray(mask))[: batch_size - pad]
        else:
            h = encode(jnp.asarray(ids), jnp.asarray(mask))
        chunks.append(h.reshape(-1, h.shape[-1]))

    z_flat = jnp.concatenate(chunks)
    codebook = kmeans_codebook_init(jax.random.key(seed), z_flat, n_e)
    codebook = np.asarray(codebook, np.float32)
    if out_path is not None:
        np.save(out_path, codebook)
    if return_diagnostics:
        # per-element std of encoder outputs across all (sentence, position)
        # rows: ~0.9 for a random-init encoder, ~0.01 in the collapsed mode.
        # Also the per-element RMS amplitude: the scale bf16 activations
        # resolve AGAINST. amplitude_ratio = std / rms is the one-number
        # predictor of deterministic-eval VQ viability (RESULTS.md round 4):
        # encoder variation below bf16's relative resolution (~2^-8) of the
        # activation magnitude is erased by the bf16 trunk at eval time no
        # matter how the (centered) distances are computed. Round-4 doomed
        # run: 0.0014; round-3 healthy run: ~0.8.
        # ONE jit for both stats: an eager z_flat.astype(f32) materializes a
        # full second copy of the (N*S, 768) matrix (~4 GB at the large
        # corpus) and OOMs the chip (measured round 5); inside jit the cast
        # fuses into the reductions.
        @jax.jit
        def _amp_stats(z):
            z32 = z.astype(jnp.float32)
            return jnp.std(z32, axis=0).mean(), jnp.sqrt(jnp.mean(jnp.square(z32)))

        z_std_d, z_rms_d = _amp_stats(z_flat)
        z_std, z_rms = float(z_std_d), float(z_rms_d)
        d = codebook[:, None, :] - codebook[None, :, :]
        dist = np.sqrt((d * d).sum(-1))
        iu = np.triu_indices(n_e, 1)
        # RELATIVE separation: ABSOLUTE centroid distances say nothing about
        # separability (round 4: a trained bert-base encoder is perfectly
        # separable at centroid distances ~0.06 once the VQ distances are
        # centered, ops/vq.py). Compare the min centroid gap to the
        # in-cluster RMS distance on a row subsample: ratio >> 1 = crisp
        # clusters, << 1 = the codes sit inside the clusters' own noise.
        samp = np.asarray(z_flat[:: max(1, z_flat.shape[0] // 65536)], np.float64)
        c64 = np.asarray(codebook, np.float64)
        gmean = samp.mean(0, keepdims=True)
        d2 = (
            ((samp - gmean) ** 2).sum(1, keepdims=True)
            + ((c64 - gmean) ** 2).sum(1)
            - 2.0 * (samp - gmean) @ (c64 - gmean).T
        )
        rms_in = float(np.sqrt(np.maximum(d2.min(1), 0.0).mean()))
        diag = {
            "encoder_per_element_std": z_std,
            "encoder_per_element_rms": z_rms,
            "amplitude_ratio": z_std / max(z_rms, 1e-12),
            "centroid_dist_min": float(dist[iu].min()),
            "centroid_dist_mean": float(dist[iu].mean()),
            "centroid_norm_mean": float(np.linalg.norm(codebook, axis=1).mean()),
            "in_cluster_rms": rms_in,
            "separation_ratio": float(dist[iu].min() / max(rms_in, 1e-12)),
        }
        print(f"[codebook_init] diagnostics: {diag}", flush=True)
        return codebook, diag
    return codebook


def _main():
    """Runnable script contract mirroring the reference's
    models/shelgon3/vq_codebook_init_weights.py: encode the train split with
    a (frozen) Bagon encoder, k-means the flattened hidden states, save the
    (n_e, hidden) init values as .npy.

        python -m kindergarten_vq_vae_tpu.train.codebook_init \
            [--bagon-ckpt RUN_DIR/bagon_ckpt_loss_recon_val_best] \
            [--config run_conf.json] [--n-e 9] [--out codebook_init.npy]
    """
    import argparse

    from kindergarten_vq_vae_tpu.train.run import load_data

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("--bagon-ckpt", default=None,
                    help="Bagon checkpoint dir (random-init encoder if omitted)")
    ap.add_argument("--config", default=None, help="run_conf.json for geometry")
    ap.add_argument("--n-e", type=int, default=None)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--out", default="codebook_init.npy")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = RunConfig.load(args.config) if args.config else RunConfig()
    if cfg.model.model_name != "shelgon3":
        cfg = RunConfig.from_flat_dict({**cfg.get_config(), "model_name": "shelgon3"})
    splits, _ = load_data(cfg)
    cb = compute_codebook_init(
        cfg, splits["train"], bagon_ckpt_path=args.bagon_ckpt, n_e=args.n_e,
        batch_size=args.batch, out_path=args.out, seed=args.seed,
    )
    print(f"[codebook_init] saved {cb.shape} -> {args.out}")


if __name__ == "__main__":
    _main()
