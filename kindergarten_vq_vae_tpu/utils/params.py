"""Parameter-count summaries over pytrees.

Parity notes (reference: common/model_utils.py:9-26): the torch version walks
``module.parameters()`` and ``requires_grad``. Functionally, trainability is a
*mask pytree* here (see train/freezing.py), so the summaries take
``(params, trainable_mask)``.
"""

from __future__ import annotations

import jax
import numpy as np


def _leaf_size(x) -> int:
    return int(np.prod(x.shape)) if hasattr(x, "shape") else 0


def n_params(params) -> int:
    return sum(_leaf_size(x) for x in jax.tree_util.tree_leaves(params))


def n_trainable_params(params, trainable_mask) -> int:
    sizes = jax.tree_util.tree_map(
        lambda p, m: _leaf_size(p) if m else 0, params, trainable_mask
    )
    return sum(jax.tree_util.tree_leaves(sizes))


def n_not_trainable_params(params, trainable_mask) -> int:
    return n_params(params) - n_trainable_params(params, trainable_mask)


def params_summary_dict(named_subtrees: dict, trainable_masks: dict | None = None) -> dict:
    """Per-component param counts.

    ``named_subtrees`` maps component name -> param subtree (e.g.
    {"encoder": ..., "decoder": ...}), matching the dict shape of
    models/bagon/Bagon.py:58-71.
    """
    out = {}
    for name, sub in named_subtrees.items():
        if trainable_masks is not None and name in trainable_masks:
            nt = n_trainable_params(sub, trainable_masks[name])
        else:
            nt = n_params(sub)
        tot = n_params(sub)
        out[name] = {
            "n_trainable_params": nt,
            "n_not_trainable_params": tot - nt,
            "n_params": tot,
        }
    return out


def params_summary_print(named_subtrees: dict, trainable_masks: dict | None = None) -> None:
    summary = params_summary_dict(named_subtrees, trainable_masks)
    for name, counts in summary.items():
        print(
            f"[{name}] trainable: {counts['n_trainable_params']:,} | "
            f"frozen: {counts['n_not_trainable_params']:,} | "
            f"total: {counts['n_params']:,}"
        )
