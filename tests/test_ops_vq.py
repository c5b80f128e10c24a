"""Quantizer op tests: jnp VQ vs torch reference semantics, fused Pallas
kernel vs jnp oracle (values + gradients), EMA update, k-means, Gumbel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kindergarten_vq_vae_tpu.ops.gumbel import (
    gumbel_quantize,
    gumbel_softmax,
    unique_count_perplexity,
)
from kindergarten_vq_vae_tpu.ops.vq import (
    EMAState,
    ema_codebook_update,
    init_codebook,
    init_ema_state,
    kmeans_codebook_init,
    vector_quantize,
)
from kindergarten_vq_vae_tpu.ops.vq_pallas import fused_vector_quantize


def _rand_inputs(key=0, b=4, s=7, d=32, n_e=9):
    rng = np.random.default_rng(key)
    z = jnp.asarray(rng.normal(size=(b, s, d)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(n_e, d)), jnp.float32)
    return z, e


def test_vq_matches_torch_reference():
    """Golden parity vs the literal torch formulas of VectorQuantizer.py:31-93."""
    import torch

    z, e = _rand_inputs()
    out = vector_quantize(z, e, beta=0.25)

    zt = torch.as_tensor(np.asarray(z)).reshape(-1, z.shape[-1])
    et = torch.as_tensor(np.asarray(e))
    d = zt.pow(2).sum(1, keepdim=True) + et.pow(2).sum(1) - 2 * zt @ et.t()
    idx = torch.argmin(d, dim=1)
    one_hot = torch.nn.functional.one_hot(idx, e.shape[0]).float()
    zq = (one_hot @ et).reshape(z.shape)
    loss = torch.mean((zq - torch.as_tensor(np.asarray(z))) ** 2) * (1 + 0.25)
    e_mean = one_hot.mean(0)
    perp = torch.exp(-torch.sum(e_mean * torch.log(e_mean + 1e-10)))

    np.testing.assert_array_equal(np.asarray(out.indices).reshape(-1), idx.numpy())
    np.testing.assert_allclose(float(out.loss), loss.item(), rtol=1e-3)
    np.testing.assert_allclose(float(out.perplexity), perp.item(), rtol=1e-3)
    # straight-through value == quantized value
    np.testing.assert_allclose(np.asarray(out.z_q), zq.numpy(), rtol=1e-4, atol=1e-6)


def test_vq_argmin_tie_breaks_first():
    z = jnp.zeros((1, 1, 4))
    e = jnp.zeros((3, 4))  # all codes equidistant -> first index wins
    out = vector_quantize(z, e, beta=0.25)
    assert int(out.indices.reshape(())) == 0


def test_vq_ste_gradients():
    """d z_q / d z == identity (STE); loss grads match analytic formulas."""
    z, e = _rand_inputs(d=16, n_e=5)
    beta = 0.3

    def f_zq(z_):
        return jnp.sum(vector_quantize(z_, e, beta).z_q * 3.0)

    gz = jax.grad(f_zq)(z)
    np.testing.assert_allclose(np.asarray(gz), 3.0 * np.ones_like(gz), rtol=1e-6)

    def f_loss(z_, e_):
        return vector_quantize(z_, e_, beta).loss

    gz, ge = jax.grad(f_loss, argnums=(0, 1))(z, e)
    out = vector_quantize(z, e, beta)
    zq_raw = e[out.indices.reshape(-1)].reshape(z.shape)
    numel = z.size
    np.testing.assert_allclose(np.asarray(gz), 2.0 * (z - zq_raw) / numel, rtol=1e-5)
    diff = (zq_raw - z).reshape(-1, z.shape[-1])
    expected_ge = np.zeros_like(e)
    for i, ix in enumerate(np.asarray(out.indices).reshape(-1)):
        expected_ge[ix] += 2.0 * beta / numel * np.asarray(diff)[i]
    np.testing.assert_allclose(np.asarray(ge), expected_ge, rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("shape", [(4, 7, 128), (2, 12, 768), (1, 3, 256)])
def test_fused_vq_matches_jnp(shape):
    b, s, d = shape
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=shape), jnp.float32)
    e = jnp.asarray(rng.normal(size=(9, d)), jnp.float32)
    ref = vector_quantize(z, e, beta=0.25)
    fused = fused_vector_quantize(z, e, beta=0.25)
    np.testing.assert_array_equal(np.asarray(fused.indices), np.asarray(ref.indices))
    np.testing.assert_allclose(float(fused.loss), float(ref.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.z_q), np.asarray(ref.z_q), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(fused.perplexity), float(ref.perplexity), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.counts), np.asarray(ref.counts), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fused.sum_z), np.asarray(ref.sum_z), rtol=1e-4, atol=1e-4)


def test_fused_vq_gradients_match_jnp():
    z, e = _rand_inputs(b=2, s=5, d=128, n_e=7)
    beta = 0.25

    def loss_ref(z_, e_):
        o = vector_quantize(z_, e_, beta)
        return o.loss + jnp.sum(o.z_q * 0.5)

    def loss_fused(z_, e_):
        o = fused_vector_quantize(z_, e_, beta)
        return o.loss + jnp.sum(o.z_q * 0.5)

    gz_r, ge_r = jax.grad(loss_ref, argnums=(0, 1))(z, e)
    gz_f, ge_f = jax.grad(loss_fused, argnums=(0, 1))(z, e)
    np.testing.assert_allclose(np.asarray(gz_f), np.asarray(gz_r), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ge_f), np.asarray(ge_r), rtol=1e-4, atol=1e-6)


def test_fused_vq_jit_and_oddsizes():
    # rows not a multiple of the tile: padding path must not pollute stats
    z, e = _rand_inputs(b=3, s=5, d=128, n_e=9)  # M=15 rows

    @jax.jit
    def f(z_, e_):
        o = fused_vector_quantize(z_, e_, 0.25)
        return o.loss, o.counts

    loss, counts = f(z, e)
    ref = vector_quantize(z, e, 0.25)
    np.testing.assert_allclose(float(loss), float(ref.loss), rtol=1e-5)
    assert float(jnp.sum(counts)) == z.shape[0] * z.shape[1]


def test_vq_distance_resolution_far_from_origin():
    """Round-4 regression: a trained bert-base encoder puts rows on a tight
    shell far from the origin (norm ~27.6, code separations ~0.06); the raw
    |z|^2+|e|^2-2z.e expansion then needs differences far below the matmul
    magnitude and assigns everything to code 0 (perplexity 1.0 measured on
    TPU). Centered distances must recover the exact f64 assignments. The
    synthetic case makes UNCENTERED f32 fail: offset 1e4, separations 1e-4
    (cross-term differences ~768 < ulp(|z|^2)~8192)."""
    rng = np.random.default_rng(7)
    n_e, d, m = 9, 768, 256
    # per-element offset 361 -> row norm ~1e4, |z|^2 ~1e8 (f32 ulp 8);
    # center separations 1e-3/element -> distance-squared differences ~1e-3,
    # 4 orders below the uncentered expansion's resolution, while every
    # value is individually f32-representable (ulp(361) ~ 3e-5)
    offset = 361.0
    centers = offset + rng.normal(size=(n_e, d)) * 1e-3
    assign_true = rng.integers(0, n_e, size=m)
    z_flat = centers[assign_true] + rng.normal(size=(m, d)) * 2e-4
    z = jnp.asarray(z_flat.reshape(1, m, d), jnp.float32)
    e = jnp.asarray(centers, jnp.float32)

    # exact f64 reference
    d64 = ((z_flat[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    ref = d64.argmin(1)
    np.testing.assert_array_equal(ref, assign_true)

    out = vector_quantize(z, e, 0.25)
    np.testing.assert_array_equal(np.asarray(out.indices).reshape(-1), ref)
    assert float(out.perplexity) > 5.0  # not collapsed to one code

    fused = fused_vector_quantize(z, e, 0.25)
    np.testing.assert_array_equal(np.asarray(fused.indices).reshape(-1), ref)

    # the on-device Lloyd recovers well-separated-in-relative-terms clusters
    cb = kmeans_codebook_init(jax.random.key(0), jnp.asarray(z_flat, jnp.float32), n_e)
    d_k = ((z_flat[:, None, :] - np.asarray(cb, np.float64)[None, :, :]) ** 2).sum(-1)
    # every true cluster maps to a distinct learned centroid
    learned = d_k.argmin(1)
    assert len(np.unique(learned)) == n_e


def test_vq_fused_auto_policy():
    """'auto' follows the measured crossover (RESULTS.md round-4 DCE-fair
    A/B): fused below VQ_FUSED_MAX_ROWS or under a dp mesh, oracle at
    flagship row counts; True/False force."""
    from kindergarten_vq_vae_tpu.models.shelgon3 import (
        VQ_FUSED_MAX_ROWS,
        resolve_vq_fused,
    )

    assert resolve_vq_fused("auto", VQ_FUSED_MAX_ROWS, meshed=False)
    assert not resolve_vq_fused("auto", 12288, meshed=False)  # flagship shape
    assert resolve_vq_fused("auto", 12288, meshed=True)
    assert resolve_vq_fused(True, 1 << 20, meshed=False)
    assert not resolve_vq_fused(False, 8, meshed=False)


def test_init_codebook():
    key = jax.random.key(0)
    e = init_codebook(key, 10, 16)
    assert e.shape == (10, 16)
    assert float(jnp.max(jnp.abs(e))) <= 0.1  # ±1/n_e
    vals = jnp.ones((10, 16))
    np.testing.assert_array_equal(np.asarray(init_codebook(key, 10, 16, vals)), np.asarray(vals))


def test_ema_update_moves_codebook_toward_means():
    z, e = _rand_inputs(d=16, n_e=4)
    out = vector_quantize(z, e, 0.25)
    state = init_ema_state(e)
    new_e, new_state = ema_codebook_update(e, state, out.counts, out.sum_z, decay=0.5)
    assert new_e.shape == e.shape
    assert not np.allclose(np.asarray(new_e), np.asarray(e))
    # with decay=0 the codebook becomes the batch means for populated codes
    new_e0, _ = ema_codebook_update(e, EMAState(jnp.zeros(4), jnp.zeros_like(e)), out.counts, out.sum_z, decay=0.0)
    populated = np.asarray(out.counts) > 0
    means = np.asarray(out.sum_z)[populated] / np.asarray(out.counts)[populated, None]
    np.testing.assert_allclose(np.asarray(new_e0)[populated], means, rtol=1e-3)


def test_kmeans_init():
    rng = np.random.default_rng(0)
    # two well-separated blobs
    blob1 = rng.normal(size=(100, 8)) + 10
    blob2 = rng.normal(size=(100, 8)) - 10
    z = jnp.asarray(np.concatenate([blob1, blob2]), jnp.float32)
    cent = kmeans_codebook_init(jax.random.key(0), z, 2)
    c = np.sort(np.asarray(cent)[:, 0])
    assert c[0] < -5 and c[1] > 5


def test_gumbel_softmax_hard_is_onehot_with_ste():
    key = jax.random.key(0)
    logits = jnp.asarray([[2.0, 1.0, 0.0]])
    y = gumbel_softmax(key, logits, tau=1.0, hard=True)
    np.testing.assert_allclose(float(jnp.sum(y)), 1.0, rtol=1e-6)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}

    def f(lg):
        return jnp.sum(gumbel_softmax(key, lg, tau=1.0, hard=True) * jnp.asarray([1.0, 2.0, 3.0]))

    g = jax.grad(f)(logits)
    assert np.any(np.asarray(g) != 0)  # straight-through grad flows


def test_gumbel_quantize_shapes_and_eval_hard():
    key = jax.random.key(0)
    b, s, e_dim, n = 2, 5, 16, 8
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(b, s, e_dim)), jnp.float32)
    pk = jnp.asarray(rng.normal(size=(e_dim, n)), jnp.float32)
    pb = jnp.zeros((n,))
    book = jnp.asarray(rng.normal(size=(n, e_dim)), jnp.float32)
    out = gumbel_quantize(key, z, pk, pb, book, temperature=1.0, kl_div_scale=5e-4,
                          straight_through=False, is_training=False)
    assert out.z_q.shape == (b, s, e_dim)
    assert out.indices.shape == (b, s)
    # eval forces hard -> z_q rows are codebook rows
    flat_q = np.asarray(out.z_q).reshape(-1, e_dim)
    idx = np.asarray(out.indices).reshape(-1)
    np.testing.assert_allclose(flat_q, np.asarray(book)[idx], rtol=1e-5)
    perp = unique_count_perplexity(out.indices, n)
    assert 1 <= float(perp) <= n


def test_gumbel_quantize_matches_torch():
    """KL-to-uniform regularizer parity with GumbelQuantizer.py:70-73."""
    import torch

    b, s, e_dim, n = 2, 4, 8, 5
    rng = np.random.default_rng(3)
    z = rng.normal(size=(b, s, e_dim)).astype(np.float32)
    pk = rng.normal(size=(e_dim, n)).astype(np.float32)
    pb = rng.normal(size=(n,)).astype(np.float32)

    logits_j = jnp.einsum("bse,en->bns", jnp.asarray(z), jnp.asarray(pk)) + jnp.asarray(pb)[None, :, None]
    qy = jax.nn.softmax(logits_j, axis=1)
    diff_j = 5e-4 * jnp.mean(jnp.sum(qy * jnp.log(qy * n + 1e-10), axis=1))

    zt = torch.as_tensor(z).permute(0, 2, 1)  # (b, e, s)
    conv = torch.nn.Conv1d(e_dim, n, 1)
    with torch.no_grad():
        conv.weight.copy_(torch.as_tensor(pk.T).unsqueeze(-1))
        conv.bias.copy_(torch.as_tensor(pb))
    logits_t = conv(zt)
    qy_t = torch.softmax(logits_t, dim=1)
    diff_t = 5e-4 * torch.sum(qy_t * torch.log(qy_t * n + 1e-10), dim=1).mean()

    np.testing.assert_allclose(np.asarray(logits_j), logits_t.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(diff_j), diff_t.item(), rtol=1e-4)


def test_fused_ce_loss_matches_reference():
    from kindergarten_vq_vae_tpu.ops.ce_pallas import fused_ce_loss
    from kindergarten_vq_vae_tpu.train.losses import kl_recon_loss_reference

    rng = np.random.default_rng(0)
    B, S, V = 5, 7, 333  # vocab not a multiple of the tile
    logits = jnp.asarray(rng.normal(size=(B, S, V)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, (B, S)))
    valid = jnp.asarray([1, 1, 1, 0, 0], jnp.float32)

    l1 = fused_ce_loss(logits, targets, valid, 8, 128)
    l2 = kl_recon_loss_reference(logits, targets, valid)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    g1 = jax.grad(lambda lg: fused_ce_loss(lg, targets, valid, 8, 128))(logits)
    g2 = jax.grad(lambda lg: kl_recon_loss_reference(lg, targets, valid))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-7)
