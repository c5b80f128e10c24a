"""Batched inference serving for trained runs.

The reference has no serving layer (SURVEY §1: "There is no serving layer");
this is TPU-native added capability: a checkpoint-backed reconstructor with
size-bucketed pre-jitted forwards (static shapes — requests are padded up to
the nearest bucket, so every request hits an already-compiled program).

Exposes the capabilities the analyses consume online:
- ``reconstruct``: sentences -> reconstructed sentences (+ per-sentence acc)
- ``encode``: sentences -> sentence-level latents (pooler output)
- ``codes``: sentences -> VQ codebook indices (shelgon3)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


class Reconstructor:
    def __init__(self, run_path: str, ckpt_name: str | None = None,
                 batch_buckets: tuple = (8, 64, 256), tokenizer=None,
                 artifact: str | None = None):
        from kindergarten_vq_vae_tpu.analyses.common import load_run
        from kindergarten_vq_vae_tpu.data.tokenizer import _BaseTokenizer

        self.cfg, self.model, self.params = load_run(run_path, ckpt_name)
        if tokenizer is None:
            tok_path = os.path.join(self.cfg.data.data_dir, self.cfg.data.tokenizer_file)
            tokenizer = _BaseTokenizer.load(tok_path) if os.path.exists(tok_path) else None
        self.tokenizer = tokenizer
        self.seq_len = self.cfg.data.tokenized_sentence_max_length
        self.buckets = tuple(sorted(batch_buckets))
        self.model_name = self.cfg.model.model_name
        self._fns: dict[int, callable] = {}
        if artifact is not None:
            # serve the pre-compiled jax.export artifact (serve/export.py)
            # instead of jitting the live forward: no model tracing/compile
            # in the serving process
            import functools

            from kindergarten_vq_vae_tpu.serve.export import load_exported

            call, meta = load_exported(artifact)
            if meta["model_name"] != self.model_name or meta["seq_len"] != self.seq_len:
                raise ValueError(
                    f"artifact {artifact} was exported for "
                    f"{meta['model_name']}/seq{meta['seq_len']}, run is "
                    f"{self.model_name}/seq{self.seq_len}"
                )
            self.buckets = (int(meta["bucket"]),)
            self._fns[self.buckets[0]] = functools.partial(call, self.params)

    # ------------------------------------------------------------------ core

    def _forward(self, params, ids, mask):
        # params is a jit ARGUMENT, never a closure: closed-over arrays
        # lower to HLO constants, and a bert-base param tree (~880 MB f32)
        # blows the remote-compile service's request-size limit (HTTP 413)
        kwargs = dict(deterministic=True, rngs={"gumbel": jax.random.key(0)})
        if self.model_name in ("bagon", "shelgon"):
            out = self.model.apply({"params": params}, ids, mask, ids, mask, **kwargs)
        elif self.model_name == "shelgon3":
            out = self.model.apply({"params": params}, ids, mask, is_training=False, **kwargs)
        else:
            out = self.model.apply({"params": params}, ids, mask, **kwargs)
        recon_ids = jnp.argmax(out["logits"], axis=-1)
        codes = out.get("min_encoding_indices")
        return recon_ids, (codes[..., 0] if codes is not None else jnp.zeros_like(ids))

    def _fn_for(self, n: int):
        bucket = next((b for b in self.buckets if b >= n), self.buckets[-1])
        if bucket not in self._fns:
            from kindergarten_vq_vae_tpu.utils.compile import tpu_jit

            self._fns[bucket] = tpu_jit(self._forward, self.params)
        return bucket, self._fns[bucket]

    def _run_padded(self, ids: np.ndarray, mask: np.ndarray):
        n = len(ids)
        outs_r, outs_c = [], []
        i = 0
        while i < n:
            chunk = min(n - i, self.buckets[-1])
            bucket, fn = self._fn_for(chunk)
            pad = bucket - chunk
            ids_b = np.concatenate([ids[i : i + chunk], np.repeat(ids[i : i + 1], pad, axis=0)])
            mask_b = np.concatenate([mask[i : i + chunk], np.repeat(mask[i : i + 1], pad, axis=0)])
            r, c = fn(jnp.asarray(ids_b), jnp.asarray(mask_b))
            outs_r.append(np.asarray(r)[:chunk])
            outs_c.append(np.asarray(c)[:chunk])
            i += chunk
        return np.concatenate(outs_r), np.concatenate(outs_c)

    # ---------------------------------------------------------------- public

    def reconstruct(self, sentences: list[str]) -> list[dict]:
        assert self.tokenizer is not None, "serving needs the run's tokenizer"
        ids, mask = self.tokenizer.encode_batch(
            sentences, self.seq_len, self.cfg.data.tokenizer_add_special_tokens
        )
        recon_ids, codes = self._run_padded(ids, mask)
        out = []
        for i, s in enumerate(sentences):
            recon = self.tokenizer.decode(recon_ids[i])
            acc = float(np.mean(recon_ids[i] == ids[i]))
            row = {"input": s, "reconstruction": recon, "token_acc": acc}
            if self.model_name == "shelgon3":
                row["codes"] = codes[i][: int(mask[i].sum())].tolist()
            out.append(row)
        return out

    def encode(self, sentences: list[str]) -> np.ndarray:
        """Sentence-level latents (encoder pooler output)."""
        from kindergarten_vq_vae_tpu.analyses.latent_space import compute_sentence_latents

        ids, mask = self.tokenizer.encode_batch(
            sentences, self.seq_len, self.cfg.data.tokenizer_add_special_tokens
        )
        return compute_sentence_latents(
            self.model, self.params, ids, mask, batch_size=self.buckets[-1]
        )

    def codes(self, sentences: list[str]) -> list[list[int]]:
        """VQ codebook indices per token (shelgon3)."""
        assert self.model_name == "shelgon3", "codes() requires a shelgon3 run"
        ids, mask = self.tokenizer.encode_batch(
            sentences, self.seq_len, self.cfg.data.tokenizer_add_special_tokens
        )
        _, codes = self._run_padded(ids, mask)
        return [codes[i][: int(mask[i].sum())].tolist() for i in range(len(sentences))]
