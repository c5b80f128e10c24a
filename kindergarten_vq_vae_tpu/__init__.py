"""kindergarten_vq_vae_tpu — TPU-native rebuild of Kindergarten-VQ-VAE.

A brand-new JAX/Flax/XLA/Pallas framework with the capabilities of the
PyTorch reference `dansolombrino/Kindergarten-VQ-VAE`:

- ``data``      offline dSentences generation / preprocessing / tokenization
                into static-shape int32 arrays (ref: datasets/dSentences/*)
- ``nn``        from-scratch Flax BERT encoder + BERT-LM-head decoder with
                cross-attention (ref: HF EncoderDecoderModel usage in
                models/bagon/Bagon.py:25-31)
- ``ops``       vector-quantization bottlenecks: pure-jnp reference, fused
                Pallas TPU kernel, EMA codebook updates, Gumbel quantizer
                (ref: models/shelgon3/{VectorQuantizer,GumbelQuantizer}.py)
- ``models``    Bagon / Shelgon / Shelgon2 / Shelgon3 assemblies
- ``train``     one shared jit-compiled train/eval engine (the reference
                clones its Trainer.py four times; here there is one)
- ``ckpt``      Orbax checkpointing with the reference's bundle semantics
- ``parallel``  jax.sharding Mesh utilities (DP/TP); the reference is
                single-device, this layer is TPU-native added capability
- ``analyses``  vmapped batch-inference analyses (ref: analyses/*)
"""

__version__ = "0.1.0"
