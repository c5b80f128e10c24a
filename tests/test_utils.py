"""Utils tests: metrics parity vs torch reference formulas, perturbation ops."""

import jax
import jax.numpy as jnp
import numpy as np

from kindergarten_vq_vae_tpu.utils.metrics import (
    codebook_perplexity,
    padding_tokens_pct,
    perplexity_from_counts,
    seq_acc,
    seq_acc_masked,
)
from kindergarten_vq_vae_tpu.utils.tensor import (
    replace_pct_rand_columns,
    replace_pct_rand_values,
)


def test_seq_acc_parity_with_torch_formula():
    import torch

    rng = np.random.default_rng(0)
    a = rng.integers(0, 10, (4, 12))
    b = rng.integers(0, 10, (4, 12))
    acc_b, acc_s = seq_acc(jnp.asarray(a), jnp.asarray(b))
    # reference formula (common/metrics.py:8-36)
    ta, tb = torch.as_tensor(a), torch.as_tensor(b)
    mask = (ta - tb) == 0
    ref_b = (mask.sum() / ta.numel()).item()
    ref_s = torch.mean(mask.float(), dim=-1).numpy()
    assert abs(float(acc_b) - ref_b) < 1e-6
    np.testing.assert_allclose(np.asarray(acc_s), ref_s, atol=1e-6)


def test_seq_acc_counts_padding_as_match():
    # both pad to 0 -> those positions count as correct (parity quirk)
    a = jnp.asarray([[1, 2, 0, 0]])
    b = jnp.asarray([[1, 3, 0, 0]])
    acc_b, _ = seq_acc(a, b)
    assert float(acc_b) == 0.75
    mask = jnp.asarray([[1, 1, 0, 0]])
    acc_m, _ = seq_acc_masked(a, b, mask)
    assert float(acc_m) == 0.5


def test_codebook_perplexity():
    # uniform usage over 4 codes -> perplexity 4
    oh = jnp.eye(4).repeat(10, axis=0)
    assert abs(float(codebook_perplexity(oh)) - 4.0) < 1e-3
    counts = jnp.asarray([10, 10, 10, 10])
    assert abs(float(perplexity_from_counts(counts, 40)) - 4.0) < 1e-3
    # single code -> perplexity 1
    oh1 = jnp.zeros((10, 4)).at[:, 2].set(1.0)
    assert abs(float(codebook_perplexity(oh1)) - 1.0) < 1e-3


def test_padding_tokens_pct():
    ids = jnp.asarray([[5, 6, 0, 0], [7, 0, 0, 0]])
    assert abs(float(padding_tokens_pct(ids)) - 62.5) < 1e-5


def test_replace_pct_rand_values_exact_count():
    key = jax.random.key(0)
    ids = jnp.zeros((8, 16), dtype=jnp.int32) + 1000
    out = replace_pct_rand_values(key, ids, 0.25, 0, 100)
    changed = int(jnp.sum(out != ids))
    assert changed == int(ids.size * 0.25)
    assert bool(jnp.all(out[out != ids] < 100))
    # pct=0 is the identity (and traces nothing)
    assert replace_pct_rand_values(key, ids, 0.0, 0, 100) is ids


def test_replace_pct_rand_values_jittable():
    key = jax.random.key(1)
    ids = jnp.arange(64, dtype=jnp.int32).reshape(4, 16) + 500

    @jax.jit
    def f(k, x):
        return replace_pct_rand_values(k, x, 0.5, 0, 10)

    out = f(key, ids)
    assert int(jnp.sum(out != ids)) == 32


def test_replace_pct_rand_columns():
    key = jax.random.key(2)
    ids = jnp.zeros((6, 10), dtype=jnp.int32) + 999
    out = replace_pct_rand_columns(key, ids, 0.3, 0, 5, axis=1)
    changed_cols = jnp.any(out != ids, axis=0)
    assert int(jnp.sum(changed_cols)) == 3
    # whole columns change together
    for c in np.where(np.asarray(changed_cols))[0]:
        assert bool(jnp.all(out[:, c] != ids[:, c]))
