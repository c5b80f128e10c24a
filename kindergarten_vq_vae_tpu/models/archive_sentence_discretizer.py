"""Archived shared-weight sentence discretizer (superseded variant).

Reference: archive/SentenceDiscretizer.py:13-73 — the predecessor of
Shelgon2's per-factor discretizers: one shared Linear(emb -> 8 factors),
each scalar factor expanded 1 -> 3 by a shared Linear, gumbel-softmax over
the support, then shared expansions back to word-embedding and
sentence-length dims. Kept for inventory completeness.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from kindergarten_vq_vae_tpu.ops.gumbel import gumbel_softmax


class ArchiveSentenceDiscretizer(nn.Module):
    word_embedding_size: int
    sentence_length: int
    num_latent_generative_factors: int = 8
    max_support_size: int = 3

    @nn.compact
    def __call__(self, embedded_sentences, deterministic: bool = True):
        init = nn.initializers.normal(0.02)
        # (B, E) -> (B, F)
        latent = nn.Dense(self.num_latent_generative_factors, kernel_init=init,
                          name="sentence_to_latent_factors")(embedded_sentences)
        # (B, F, 1) -> (B, F, S3) shared expand
        latent = nn.Dense(self.max_support_size, kernel_init=init,
                          name="latent_factors_expand")(latent[..., None])
        key = self.make_rng("gumbel")
        latent_factors = gumbel_softmax(key, latent, tau=1.0, hard=False, axis=-1)
        # (B, F, S3) -> (B, F, E) shared expand
        sent = nn.Dense(self.word_embedding_size, kernel_init=init,
                        name="expand_word_embedding_dim")(latent_factors)
        # factors axis -> sentence positions (k=1 Conv1d over channels)
        w = self.param("expand_sentence_length_kernel", init,
                       (self.sentence_length, self.num_latent_generative_factors))
        b = self.param("expand_sentence_length_bias", nn.initializers.zeros,
                       (self.sentence_length,))
        latent_sentences = jnp.einsum("bfe,sf->bse", sent, w) + b[None, :, None]
        return latent_sentences, latent_factors, jnp.argmax(latent_factors, axis=-1)
