"""Sharding tests on the 8-device virtual CPU mesh: mesh construction,
param sharding rules, dp+tp train step, dp-vs-single-device parity."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from kindergarten_vq_vae_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_params,
)
from kindergarten_vq_vae_tpu.train.config import DataConfig, ModelConfig, RunConfig
from kindergarten_vq_vae_tpu.train.variants import init_params, make_loss_fn


def _cfg(**kw):
    model = ModelConfig(
        model_name="shelgon3",
        vocab_size=256,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        compute_dtype="float32",
        vq_e_dim=64,
        enc_out_size=64,
        vq_use_fused=False,
        **kw,
    )
    return RunConfig(model=model, data=DataConfig(batch_size=8, tokenized_sentence_max_length=12))


def test_make_mesh():
    assert make_mesh() is None
    mesh = make_mesh((4, 2), ("dp", "tp"))
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh((16,), ("dp",))


def test_param_sharding_rules_tp():
    cfg = _cfg()
    params = init_params(cfg, jax.random.key(0))
    mesh = make_mesh((4, 2), ("dp", "tp"))
    shardings = param_sharding_rules(params, mesh)
    qkv = shardings["encoder"]["layer_0"]["self_attn"]["qkv"]["kernel"]
    assert qkv.spec == P(None, "tp")
    out = shardings["encoder"]["layer_0"]["self_attn"]["out"]["kernel"]
    assert out.spec == P("tp", None)
    emb = shardings["encoder"]["embeddings"]["word_embeddings"]["embedding"]
    assert emb.spec == P("tp", None)
    ln = shardings["encoder"]["layer_0"]["mlp"]["layer_norm"]["scale"]
    assert ln.spec == P()


def test_sharded_train_step_matches_single_device():
    """dp-sharded loss == unsharded loss (same data, same params)."""
    cfg = _cfg()
    params = init_params(cfg, jax.random.key(0))
    loss_fn = make_loss_fn(cfg, "val")  # deterministic path

    rng = np.random.default_rng(0)
    batch_np = {
        "input_ids": rng.integers(1, 256, (8, 12)).astype(np.int32),
        "attention_mask": np.ones((8, 12), np.int32),
        "n_valid": np.int32(8),
    }
    rngs = {"dropout": jax.random.key(1), "gumbel": jax.random.key(2), "perturb": jax.random.key(3)}

    loss_single, _ = jax.jit(lambda p, b: loss_fn(p, b, rngs, True))(params, {
        k: jnp.asarray(v) for k, v in batch_np.items()
    })

    mesh = make_mesh((4, 2), ("dp", "tp"))
    params_sh = shard_params(mesh, params)
    batch_sh = shard_batch(mesh, batch_np)
    with mesh:
        loss_sharded, _ = jax.jit(lambda p, b: loss_fn(p, b, rngs, True))(params_sh, batch_sh)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=1e-5)


def test_graft_dryrun_multichip():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)  # asserts finite loss internally
    m.dryrun_multichip(2)  # dp-only path


def test_fused_vq_sharded_matches_oracle():
    """shard_map'd Pallas VQ: forward + gradients match the global oracle."""
    from kindergarten_vq_vae_tpu.ops.vq import vector_quantize
    from kindergarten_vq_vae_tpu.ops.vq_pallas import fused_vector_quantize_sharded
    from jax.sharding import NamedSharding

    mesh = make_mesh((8,), ("dp",))
    rng = np.random.default_rng(0)
    z = np.asarray(rng.normal(size=(16, 12, 128)), np.float32)
    e = np.asarray(rng.normal(size=(9, 128)), np.float32)
    z_sh = jax.device_put(z, NamedSharding(mesh, P("dp")))
    e_sh = jax.device_put(e, NamedSharding(mesh, P()))
    ref = vector_quantize(jnp.asarray(z), jnp.asarray(e), 0.25)

    @jax.jit
    def f(z_, e_):
        o = fused_vector_quantize_sharded(z_, e_, 0.25, mesh)
        return o.loss, o.z_q, o.counts, o.perplexity

    loss, zq, counts, perp = f(z_sh, e_sh)
    np.testing.assert_allclose(float(loss), float(ref.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(zq), np.asarray(ref.z_q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(ref.counts))
    np.testing.assert_allclose(float(perp), float(ref.perplexity), rtol=1e-4)

    @jax.jit
    def g(z_, e_):
        def L(zz, ee):
            o = fused_vector_quantize_sharded(zz, ee, 0.25, mesh)
            return o.loss + jnp.sum(o.z_q * 0.5)
        return jax.grad(L, argnums=(0, 1))(z_, e_)

    gz, ge = g(z_sh, e_sh)

    def Lr(zz, ee):
        o = vector_quantize(zz, ee, 0.25)
        return o.loss + jnp.sum(o.z_q * 0.5)

    gzr, ger = jax.grad(Lr, argnums=(0, 1))(jnp.asarray(z), jnp.asarray(e))
    np.testing.assert_allclose(np.asarray(gz), np.asarray(gzr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(ger), atol=1e-5)


def test_graft_dryrun_driver_env_subprocess():
    """Regression for the round-1 MULTICHIP failure: run dryrun_multichip in a
    fresh interpreter WITHOUT conftest's platform pin, simulating the driver
    environment where sitecustomize pins jax_platforms="axon,cpu". The entry
    point must self-force the 8-device virtual CPU backend."""
    import subprocess
    import sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ)
    # strip the pins conftest set for THIS process; sitecustomize (if present
    # on PYTHONPATH) still runs in the child, exactly like the driver env
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    code = (
        f"import sys; sys.path.insert(0, {repo!r}); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, f"stderr tail:\n{res.stderr[-2000:]}"
    assert "OK" in res.stdout


def test_graft_dryrun_initialized_backend_reexec():
    """If the calling process already initialized a too-small backend, the
    entry point must detect it and re-exec instead of raising."""
    import subprocess
    import sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # initialize a 1-device CPU backend BEFORE calling dryrun_multichip(8)
    code = (
        f"import sys; sys.path.insert(0, {repo!r}); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, f"stderr tail:\n{res.stderr[-2000:]}"
    assert "OK" in res.stdout


def test_fused_vq_engine_wired_per_shard():
    """NEXT.md #5 / VERDICT #3: with a mesh passed to make_loss_fn, the fused
    VQ kernel must run per-shard inside a shard_map (so GSPMD cannot insert
    an all-gather of z in front of it), and the mesh loss must match the
    single-device oracle loss."""
    from kindergarten_vq_vae_tpu.train.variants import make_loss_fn as mk

    import dataclasses

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, vq_use_fused=True))
    mesh = make_mesh((4, 2), ("dp", "tp"))
    params = init_params(cfg, jax.random.key(0))
    loss_fn = mk(cfg, "train", mesh=mesh)

    rng = np.random.default_rng(0)
    batch_np = {
        "input_ids": rng.integers(1, 256, (8, 12)).astype(np.int32),
        "attention_mask": np.ones((8, 12), np.int32),
        "n_valid": np.int32(8),
    }
    rngs = {"dropout": jax.random.key(1), "gumbel": jax.random.key(2), "perturb": jax.random.key(3)}

    # --- structural: z reaches the pallas kernel pre-sharded over dp ---
    jaxpr = jax.make_jaxpr(lambda p, b: loss_fn(p, b, rngs, True))(
        params, {k: jnp.asarray(v) for k, v in batch_np.items()}
    )

    def find_shard_maps(jx, acc):
        for eqn in jx.eqns:
            if eqn.primitive.name == "shard_map":
                acc.append(eqn)
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    find_shard_maps(v.jaxpr, acc)
        return acc

    smaps = find_shard_maps(jaxpr.jaxpr, [])
    assert smaps, "no shard_map in the mesh train loss — fused VQ not wired per-shard"
    # the VQ shard_map consumes z (8,12,64) split over dp=4 -> (2,12,64)
    vq_maps = [
        e for e in smaps
        if any(tuple(getattr(v.aval, "shape", ())) == (2, 12, 64) for v in e.params["jaxpr"].invars)
    ]
    assert vq_maps, "shard_map found but not over the per-dp-shard z (2,12,64)"
    inner = vq_maps[0].params["jaxpr"]
    names = {eq.primitive.name for eq in inner.eqns}
    assert "pallas_call" in names or "custom_vjp_call_jaxpr" in names or any(
        "pallas" in n or "custom" in n for n in names
    ), f"per-shard body has no pallas/custom-vjp call: {names}"

    # --- numeric: mesh loss == single-device oracle loss ---
    cfg_oracle = _cfg()
    oracle_fn = mk(cfg_oracle, "train")
    loss_single, _ = jax.jit(lambda p, b: oracle_fn(p, b, rngs, True))(
        params, {k: jnp.asarray(v) for k, v in batch_np.items()}
    )
    params_sh = shard_params(mesh, params)
    batch_sh = shard_batch(mesh, batch_np)
    with mesh:
        loss_mesh, _ = jax.jit(lambda p, b: loss_fn(p, b, rngs, True))(params_sh, batch_sh)
    np.testing.assert_allclose(float(loss_single), float(loss_mesh), rtol=1e-5)


def test_fused_trunk_sharded_matches_oracle():
    """VERDICT r2 #1: with fused_layer on under a mesh, the whole trunk runs
    dp-sharded via ONE shard_map per trunk (nn/bert._fused_trunk_sharded).
    Loss AND parameter gradients must match the unfused single-device oracle,
    and the compiled HLO must contain no all-gather of the batch activations
    (weights enter replicated; only their grad reduction may communicate)."""
    import dataclasses
    import re

    fused_kw = dict(fused_layer="on", layer_block_b_fwd=8, layer_block_b_bwd=8,
                    layer_attn_chunk=4)
    cfg_fused = _cfg(**fused_kw)
    cfg_oracle = _cfg()
    mesh = make_mesh((4, 2), ("dp", "tp"))
    params = init_params(cfg_oracle, jax.random.key(0))

    rng = np.random.default_rng(0)
    batch_np = {
        "input_ids": rng.integers(1, 256, (8, 12)).astype(np.int32),
        "attention_mask": np.ones((8, 12), np.int32),
        "n_valid": np.int32(8),
    }
    rngs = {"dropout": jax.random.key(1), "gumbel": jax.random.key(2),
            "perturb": jax.random.key(3)}

    oracle_fn = make_loss_fn(cfg_oracle, "val")  # deterministic, unfused
    fused_fn = make_loss_fn(cfg_fused, "val", mesh=mesh)

    def L(fn):
        return lambda p, b: fn(p, b, rngs, True)[0]

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    loss_single, g_single = jax.value_and_grad(L(oracle_fn))(params, batch)

    params_sh = shard_params(mesh, params)
    batch_sh = shard_batch(mesh, batch_np)
    with mesh:
        step = jax.jit(jax.value_and_grad(L(fused_fn)))
        loss_mesh, g_mesh = step(params_sh, batch_sh)
        # --- HLO: the batch activations must never be all-gathered.
        # (tp-sharded WEIGHTS are all-gathered into the replicated kernel
        # inputs — expected; those shapes carry no batch dims.)
        hlo = step.lower(params_sh, batch_sh).compile().as_text()
    np.testing.assert_allclose(float(loss_single), float(loss_mesh), rtol=2e-5)

    import jax.tree_util as jtu

    scale = max(float(jnp.max(jnp.abs(l))) for l in jtu.tree_leaves(g_single))
    for (path, a), b in zip(jtu.tree_leaves_with_path(g_single), jtu.tree_leaves(g_mesh)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5 * scale + 1e-6, rtol=5e-3,
            err_msg=f"grad mismatch at {jtu.keystr(path)}",
        )

    bad = [ln for ln in hlo.splitlines()
           if "all-gather" in ln and re.search(r"\[8,12", ln)]
    assert not bad, f"batch activations all-gathered:\n" + "\n".join(bad[:5])


def test_fused_trunk_sharded_train_dropout_runs():
    """Train-stage (dropout on) sharded fused trunk executes: exercises the
    per-shard seed decorrelation (axis_index fold) inside shard_map."""
    cfg = _cfg(fused_layer="on", layer_block_b_fwd=8, layer_block_b_bwd=8,
               layer_attn_chunk=4)
    mesh = make_mesh((8,), ("dp",))
    params = init_params(cfg, jax.random.key(0))
    loss_fn = make_loss_fn(cfg, "train", mesh=mesh)
    rng = np.random.default_rng(0)
    batch_np = {
        "input_ids": rng.integers(1, 256, (8, 12)).astype(np.int32),
        "attention_mask": np.ones((8, 12), np.int32),
        "n_valid": np.int32(8),
    }
    rngs = {"dropout": jax.random.key(1), "gumbel": jax.random.key(2),
            "perturb": jax.random.key(3)}
    params_sh = shard_params(mesh, params)
    batch_sh = shard_batch(mesh, batch_np)
    with mesh:
        (loss, _), grads = jax.jit(
            jax.value_and_grad(lambda p, b: loss_fn(p, b, rngs, False), has_aux=True)
        )(params_sh, batch_sh)
    assert np.isfinite(float(loss))
    import jax.tree_util as jtu

    assert all(np.all(np.isfinite(np.asarray(l))) for l in jtu.tree_leaves(grads))
