"""Input-perturbation utilities, functionalized for jit (threaded PRNG keys).

Parity notes (reference: common/tensor_utils.py):
- ``replace_pct_rand_values`` corrupts exactly ``floor(pct * numel)`` randomly
  chosen elements with uniform random ints (tensor_utils.py:13-49). The
  reference draws a random permutation of a 0/1 mask; here we permute an
  iota and threshold — same distribution, one fused XLA program.
- ``replace_pct_rand_columns`` corrupts a fixed set of columns shared across
  the batch (tensor_utils.py:52-87, used by the Shelgon trainer).

Both are pure: they take a jax PRNG key instead of using global RNG state,
and are no-ops when ``pct == 0`` (static python check, so jit never traces
the corruption path for the common pct=0 configs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def replace_pct_rand_values(
    key: jax.Array,
    ids: jnp.ndarray,
    pct: float,
    rand_int_low: int,
    rand_int_high: int,
) -> jnp.ndarray:
    """Replace exactly ``floor(pct * numel)`` elements with uniform ints.

    ``pct`` must be a static python float (it selects a static corruption
    count, keeping shapes static under jit).
    """
    if math.isclose(pct, 0.0):
        return ids

    num_corrupt = int(ids.size * pct)
    if num_corrupt == 0:
        return ids

    key_perm, key_noise = jax.random.split(key)
    # Positions ranked by a random permutation; the first num_corrupt get noise.
    ranks = jax.random.permutation(key_perm, ids.size).reshape(ids.shape)
    corrupt_mask = ranks < num_corrupt
    noise = jax.random.randint(key_noise, ids.shape, rand_int_low, rand_int_high, dtype=ids.dtype)
    return jnp.where(corrupt_mask, noise, ids)


def replace_pct_rand_columns(
    key: jax.Array,
    ids: jnp.ndarray,
    pct: float,
    rand_int_low: int,
    rand_int_high: int,
    axis: int = 1,
) -> jnp.ndarray:
    """Corrupt ``floor(pct * dim)`` whole columns (shared indices across the
    batch), the semantics of common/tensor_utils.py:52-87."""
    if math.isclose(pct, 0.0):
        return ids

    dim = ids.shape[axis]
    num_corrupt = int(dim * pct)
    if num_corrupt == 0:
        return ids

    key_perm, key_noise = jax.random.split(key)
    ranks = jax.random.permutation(key_perm, dim)
    col_mask = ranks < num_corrupt  # (dim,)
    shape = [1] * ids.ndim
    shape[axis] = dim
    col_mask = col_mask.reshape(shape)
    noise = jax.random.randint(key_noise, ids.shape, rand_int_low, rand_int_high, dtype=ids.dtype)
    return jnp.where(col_mask, noise, ids)
