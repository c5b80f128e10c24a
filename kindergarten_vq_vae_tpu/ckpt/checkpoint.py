"""Orbax checkpointing with the reference's bundle semantics.

Reference contract (models/bagon/Trainer.py:279-296):
- bundles ``{model_state_dict, encoder_state_dict, decoder_state_dict}``
  — here the params tree IS the model state and encoder/decoder are its
  subtrees, so one tree carries the same information;
- best-file naming ``{model}_ckpt_{loss_recon|metric_acc|loss_vq}_{stage}_best``;
- a run dir pairs the checkpoint with ``run_conf.json``
  (analyses/latent_traversals/...py:41-55 reconstructs models from that
  pairing).

New capability beyond the reference (SURVEY §5.4: resume is an acknowledged
reference TODO): full train-state save/restore (params + optimizer state +
epoch) for crash-safe resumption.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def best_ckpt_name(model_name: str, stat: str, stage: str) -> str:
    return f"{model_name}_ckpt_{stat}_{stage}_best"


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, params) -> None:
    """Save a params tree (the model bundle) at ``path`` (a directory)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), params, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template=None):
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(_abs(path), abstract)
    return ckptr.restore(_abs(path))


def save_train_state(path: str, state) -> None:
    """Resume bundle: params + opt_state + step/epoch counters."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template):
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    return ckptr.restore(_abs(path), abstract)


def load_bagon_into_model(model_params, bagon_ckpt_path: str):
    """Warm-start a shelgon-family model from a Bagon checkpoint: replace the
    encoder/decoder subtrees, keep the bottleneck params fresh
    (ref models/shelgon3/Shelgon.py:41-45)."""
    template = {"encoder": model_params["encoder"], "decoder": model_params["decoder"]}
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    try:
        loaded = ckptr.restore(_abs(bagon_ckpt_path), abstract)
    except BaseException:
        # full bagon tree saved: restore whole and take subtrees
        loaded = ckptr.restore(_abs(bagon_ckpt_path))
        loaded = {"encoder": loaded["encoder"], "decoder": loaded["decoder"]}
    out = dict(model_params)
    out["encoder"] = loaded["encoder"]
    out["decoder"] = loaded["decoder"]
    return out
