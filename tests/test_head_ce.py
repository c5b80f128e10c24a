"""Fused MLM-head+CE+argmax kernels (ops/head_ce_pallas.py), the streaming
CE+argmax variant (ops/ce_pallas.fused_ce_loss_ids), and the fused Adam
update (ops/adam_pallas.py) — value/gradient/bitwise parity vs the oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from kindergarten_vq_vae_tpu.ops.adam_pallas import FusedAdam
from kindergarten_vq_vae_tpu.ops.ce_pallas import fused_ce_loss_ids
from kindergarten_vq_vae_tpu.ops.head_ce_pallas import (
    fused_head_ce_loss,
    fused_head_ce_loss_sharded,
)
from kindergarten_vq_vae_tpu.parallel.mesh import make_mesh
from kindergarten_vq_vae_tpu.train.config import OptimConfig
from kindergarten_vq_vae_tpu.train.losses import kl_recon_loss_reference
from kindergarten_vq_vae_tpu.train.optim import make_optimizer

B, S, H, V = 4, 6, 32, 133  # ragged vocab edge on purpose


def _data(dtype):
    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    hidden = (jax.random.normal(k1, (B, S, H)) * 0.5).astype(dtype)
    table = jax.random.normal(k2, (V, H)) * 0.3
    bias = jax.random.normal(k3, (V,)) * 0.1
    tgt = jax.random.randint(k4, (B, S), 0, V)
    valid = (jnp.arange(B) < B - 1).astype(jnp.float32)  # padded tail row
    return hidden, table, bias, tgt, valid


def _oracle(hidden, table, bias, tgt, valid):
    x2 = hidden.reshape(-1, H)
    logits = (x2 @ table.astype(hidden.dtype).T + bias.astype(hidden.dtype)).reshape(B, S, V)
    return kl_recon_loss_reference(logits, tgt, valid), jnp.argmax(logits, axis=-1)


@pytest.mark.parametrize("mode", ["store", "flash"])
def test_fused_head_ce_matches_oracle_f32(mode):
    hidden, table, bias, tgt, valid = _data(jnp.float32)
    lo, ids_o = _oracle(hidden, table, bias, tgt, valid)
    lf, ids_f = fused_head_ce_loss(hidden, table, bias, tgt, valid, None, mode, 32, 64, True)
    np.testing.assert_allclose(float(lf), float(lo), rtol=1e-5)
    assert bool(jnp.all(ids_f == ids_o))

    g_o = jax.grad(lambda h, t, b: _oracle(h, t, b, tgt, valid)[0], argnums=(0, 1, 2))(
        hidden, table, bias)
    g_f = jax.grad(
        lambda h, t, b: fused_head_ce_loss(h, t, b, tgt, valid, None, mode, 32, 64, True)[0],
        argnums=(0, 1, 2),
    )(hidden, table, bias)
    for a, b_ in zip(g_o, g_f):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["store", "flash"])
def test_fused_head_ce_bf16_close(mode):
    hidden, table, bias, tgt, valid = _data(jnp.bfloat16)
    lo, ids_o = _oracle(hidden, table, bias, tgt, valid)
    lf, ids_f = fused_head_ce_loss(hidden, table, bias, tgt, valid, None, mode, 32, 64, True)
    # bf16 matmul rounding-order noise only (each logit within 1 bf16 ulp);
    # argmax can flip on near-ties, so ids are compared statistically here
    # (the f32 test above asserts exact ids)
    np.testing.assert_allclose(float(lf), float(lo), rtol=3e-4)
    assert float(jnp.mean((ids_f == ids_o).astype(jnp.float32))) > 0.95
    g_o = jax.grad(lambda t: _oracle(hidden, t, bias, tgt, valid)[0])(table)
    g_f = jax.grad(
        lambda t: fused_head_ce_loss(hidden, t, bias, tgt, valid, None, mode, 32, 64, True)[0]
    )(table)
    scale = float(jnp.max(jnp.abs(g_o))) + 1e-9
    assert float(jnp.max(jnp.abs(g_f - g_o))) / scale < 3e-2


def test_fused_ce_loss_ids_matches():
    logits = jax.random.normal(jax.random.key(5), (B, S, V)).astype(jnp.bfloat16)
    tgt = jax.random.randint(jax.random.key(6), (B, S), 0, V)
    valid = jnp.ones((B,), jnp.float32)
    lo = kl_recon_loss_reference(logits, tgt, valid)
    lf, ids = fused_ce_loss_ids(logits, tgt, valid, 8, 64, True)
    np.testing.assert_allclose(float(lf), float(lo), rtol=1e-5)
    assert bool(jnp.all(ids == jnp.argmax(logits, axis=-1)))
    g1 = jax.grad(lambda lg: fused_ce_loss_ids(lg, tgt, valid, 8, 64, True)[0])(logits)
    g2 = jax.grad(lambda lg: kl_recon_loss_reference(lg, tgt, valid))(logits)
    np.testing.assert_allclose(
        np.asarray(g1, np.float32), np.asarray(g2, np.float32), atol=1e-6)


def test_fused_head_ce_sharded_matches():
    """shard_map'd head+CE over dp: loss/ids/grads match the unsharded op
    (per-shard partial losses with the GLOBAL denom, table cotangent reduced
    by the shard_map transpose)."""
    mesh = make_mesh((8,), ("dp",))
    hidden, table, bias, tgt, valid = _data(jnp.float32)
    hidden = jnp.tile(hidden, (2, 1, 1))  # 8 rows -> one per device
    tgt = jnp.tile(tgt, (2, 1))
    valid = jnp.concatenate([valid, valid])
    lo, ids_o = _oracle_big(hidden, table, bias, tgt, valid)

    h_sh = jax.device_put(hidden, NamedSharding(mesh, P("dp")))
    t_sh = jax.device_put(table, NamedSharding(mesh, P()))

    def raw(h, t):
        return fused_head_ce_loss_sharded(h, t, bias, tgt, valid, mesh, ("dp",),
                                          "store", 8, 64, True)

    loss, ids = jax.jit(raw)(h_sh, t_sh)
    np.testing.assert_allclose(float(loss), float(lo), rtol=1e-5)
    assert bool(jnp.all(ids == ids_o))

    gh, gt = jax.jit(
        lambda h, t: jax.grad(lambda hh, tt: raw(hh, tt)[0], argnums=(0, 1))(h, t)
    )(h_sh, t_sh)
    gh_o, gt_o = jax.grad(lambda hh, tt: _oracle_big(hh, tt, bias, tgt, valid)[0],
                          argnums=(0, 1))(hidden, table)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_o), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_o), rtol=2e-5, atol=1e-6)


def _oracle_big(hidden, table, bias, tgt, valid):
    b, s, h = hidden.shape
    x2 = hidden.reshape(-1, h)
    logits = (x2 @ table.astype(hidden.dtype).T + bias.astype(hidden.dtype)).reshape(
        b, s, table.shape[0])
    return kl_recon_loss_reference(logits, tgt, valid), jnp.argmax(logits, axis=-1)


def test_fused_adam_matches_optax():
    cfg = OptimConfig(lr=3e-3, weight_decay=0.01, amsgrad=True,
                      lr_scheduler="MultiStepLR", milestones=(3,), gamma=0.1)
    params = {
        "w": jax.random.normal(jax.random.key(0), (16, 128)),      # pallas path
        "b": jax.random.normal(jax.random.key(1), (96,)),          # jnp path
        "frozen": jax.random.normal(jax.random.key(3), (8, 128)),
    }
    mask = {"w": True, "b": True, "frozen": False}
    tx = make_optimizer(cfg, mask)
    opt_state = tx.init(params)
    fa = FusedAdam(cfg, mask, interpret=True)  # force the kernel (interpret)
    fs = fa.init(params)
    fj = FusedAdam(cfg, mask, path="jnp")  # crash-safe fused-expression path
    fjs = fj.init(params)
    p1, p2, p3 = params, params, params
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.sin(p * (step + 1)).astype(p.dtype), params)
        upd, opt_state = tx.update(grads, opt_state, p1)
        p1 = optax.apply_updates(p1, upd)
        p2, fs = fa.apply(grads, fs, p2)
        p3, fjs = fj.apply(grads, fjs, p3)
    # jnp path is bitwise; frozen leaves untouched
    assert float(jnp.max(jnp.abs(p1["b"] - p2["b"]))) == 0.0
    assert float(jnp.max(jnp.abs(p1["frozen"] - p2["frozen"]))) == 0.0
    # pallas path: <= ulp-class (FMA contraction in the kernel lowering)
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p1["w"]),
                               rtol=5e-7, atol=1e-9)
    assert int(fs.count) == 5
    # path="jnp" is bitwise vs optax on EVERY leaf (same expressions)
    for k in params:
        assert float(jnp.max(jnp.abs(p1[k] - p3[k]))) == 0.0, k
    assert int(fjs.count) == 5


def test_loss_fn_fused_head_wiring():
    """make_loss_fn with fused_head_ce on vs off: same loss/acc on shelgon3
    (the flagship path), proving the model-side rewiring (mlm_hidden/
    head_table/head_bias) is equivalent to the logits path."""
    from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
    from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn

    def cfg_with(fhc):
        model = ModelConfig(
            model_name="shelgon3", vocab_size=133, hidden_size=32, num_layers=1,
            num_heads=2, intermediate_size=64, compute_dtype="float32",
            vq_e_dim=32, enc_out_size=32, vq_use_fused=False,
            fused_layer="off", fused_attn="off",
            fused_head_ce=fhc, head_ce_block_r=16, head_ce_block_v=64,
        )
        return RunConfig(model=model,
                         data=DataConfig(batch_size=4, tokenized_sentence_max_length=6))

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 133, (4, 6)), jnp.int32),
        "attention_mask": jnp.ones((4, 6), jnp.int32),
        "n_valid": jnp.asarray(4, jnp.int32),
    }
    rngs = {"dropout": jax.random.key(1), "gumbel": jax.random.key(2),
            "perturb": jax.random.key(3)}
    params = init_params(cfg_with("off"), jax.random.key(0))

    outs = {}
    for fhc in ("off", "store", "flash"):
        loss_fn = make_loss_fn(cfg_with(fhc), "val")
        loss, aux = loss_fn(params, batch, rngs, True)
        outs[fhc] = (float(loss), np.asarray(aux["recon_ids"]), float(aux["metric_acc"]))
    for fhc in ("store", "flash"):
        np.testing.assert_allclose(outs[fhc][0], outs["off"][0], rtol=1e-5)
        assert (outs[fhc][1] == outs["off"][1]).all()
        np.testing.assert_allclose(outs[fhc][2], outs["off"][2], rtol=1e-6)
