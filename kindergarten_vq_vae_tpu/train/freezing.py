"""Freezing modes as optimizer mask pytrees.

The reference mutates ``requires_grad`` over module trees
(models/bagon/Bagon.py:87-179). Functionally, trainability is data: a
boolean pytree aligned with params, consumed by optax.masked.

Mode semantics (Bagon.py:126-179, identical across all four variants):
- ``full``: everything trainable.
- ``dec-head-ft``: freeze encoder + decoder, then unfreeze the decoder LM
  head (cls.predictions.transform.dense + cls.predictions.decoder,
  Bagon.py:100-107) and the decoder cross-attention when
  ``cross_attn_make_trainable`` (Bagon.py:113-124; shelgon always unfreezes
  it, shelgon/Shelgon.py:169). With tied embeddings, torch's
  ``decoder.weight`` IS the word-embedding table, so unfreezing the head
  unfreezes the shared table — replicated here deliberately.
- ``enc-head-ft-dec-head-ft``: dec-head-ft + encoder last layer + pooler
  (Bagon.py:142-149).
- ``vq-ft``: freeze encoder + decoder entirely (Bagon.py:168-177).
Components outside encoder/decoder (quantizers, projections, discretizers)
are trainable in every mode — the reference's helpers only ever touch
encoder/decoder params ("Vector Quantizer still trainable!", Bagon.py:134).
"""

from __future__ import annotations

from flax import traverse_util

from kindergarten_vq_vae_tpu.utils.consts import SUPPORTED_MODEL_MODES


def _num_encoder_layers(flat_paths) -> int:
    layers = set()
    for path in flat_paths:
        if path[0] == "encoder" and len(path) > 1 and path[1].startswith("layer_"):
            layers.add(int(path[1].split("_")[1]))
    return (max(layers) + 1) if layers else 0


def trainable_mask(
    params,
    mode: str,
    cross_attn_trainable: bool = True,
    tie_word_embeddings: bool = True,
) -> dict:
    """Boolean pytree with the same structure as ``params``."""
    if mode not in SUPPORTED_MODEL_MODES:
        raise ValueError(
            f"Invalid model mode {mode}, please use one of the following: "
            + ", ".join(SUPPORTED_MODEL_MODES)
        )

    flat = traverse_util.flatten_dict(params)
    n_layers = _num_encoder_layers(flat.keys())

    def decide(path) -> bool:
        top = path[0]
        if mode == "full":
            return True
        if top not in ("encoder", "decoder"):
            return True  # quantizer/proj/discretizers always trainable
        if mode == "vq-ft":
            return False

        # dec-head-ft base rules
        trainable = False
        gpt2_cross = ("q_attn", "crossattention_c_attn", "crossattention_c_proj", "ln_cross_attn")
        if top == "decoder":
            if path[1] == "mlm_head":
                # transform.dense + decoder projection (+ bias); the
                # transform LayerNorm stays frozen (not in Bagon.py:106-107)
                if path[2] in ("transform_dense", "decoder_kernel", "decoder_bias"):
                    trainable = True
            elif path[1] == "bert":
                if tie_word_embeddings and path[2:5] == ("embeddings", "word_embeddings", "embedding"):
                    trainable = True  # tied-head torch parity
                if len(path) > 3 and path[3] == "cross_attn" and cross_attn_trainable:
                    trainable = True
            # GPT-2 decoder layout (Bagon.py:109-110 lm_head; :120-124
            # crossattention + ln_cross_attn per block)
            elif path[1] == "lm_head_kernel":
                trainable = True
            elif path[1] == "wte" and tie_word_embeddings:
                trainable = True  # tied lm_head IS wte in torch
            elif path[1].startswith("layer_") and len(path) > 2 and path[2] in gpt2_cross and cross_attn_trainable:
                trainable = True
        if mode == "enc-head-ft-dec-head-ft" and top == "encoder":
            if path[1] == f"layer_{n_layers - 1}" or path[1] == "pooler":
                trainable = True
        return trainable

    flat_mask = {path: decide(path) for path in flat}
    return traverse_util.unflatten_dict(flat_mask)
