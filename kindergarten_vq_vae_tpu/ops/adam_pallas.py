"""Fused Adam(+amsgrad, +L2) parameter update as a single Pallas pass.

The optax chain (train/optim.make_optimizer: add_decayed_weights ->
scale_by_amsgrad -> scale_by_learning_rate, then optax.apply_updates)
touches five full param-sized f32 trees (p, g, mu, nu, nu_max ~ 880 MB each
at bert-base x2) and produces four; its HBM floor is ~9.7 ms/step on v5e and
the measured segment is ~12 ms (NEXT.md #2). This kernel does the whole
update — L2 decay, both moment EMAs, bias corrections, the amsgrad max, the
lr scaling and the parameter add — in ONE read/write pass per leaf
(buffers reused via jit-level donation; pallas-level aliasing is avoided —
it breaks the axon remote backend, see the note in _leaf_update_pallas).

Bit-compatibility: every arithmetic step mirrors the optax source exactly
(optax.tree.update_moment: ``(1-b)*g + b*m``; bias_correction divides by
``1 - b**count`` computed in f32; nu_max maxes the *bias-corrected* nu_hat;
update = mu_hat / (sqrt(nu_hat_max + 0) + eps); L2 adds ``wd*p`` to the
gradient BEFORE the moments, matching torch Adam(weight_decay) /
add_decayed_weights-first — models/bagon/main.py:76). The parity test
(tests/test_ops_vq.py) asserts the fused path matches the optax chain to
float32 exactness over multiple steps.

Only 2-D, lane-aligned leaves go through the kernel (every matmul weight and
embedding table; >99.9% of bytes). 1-D leaves (biases, LN scales) take a
same-formula jnp path that XLA fuses into one loop — not worth a kernel.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedAdamState(NamedTuple):
    count: jnp.ndarray  # () int32
    mu: Any
    nu: Any
    nu_max: Any


def _adam_kernel(s_ref, p_ref, g_ref, mu_ref, nu_ref, vm_ref,
                 po_ref, muo_ref, nuo_ref, vmo_ref):
    # omb1/omb2 are (1 - b) computed in python f64 then rounded, matching
    # optax.tree.update_moment's `(1 - decay)` exactly (f32 `1.0 - b` is
    # 1 ulp off for b=0.9 and would drift the update ulp-by-ulp)
    lr, wd, b1, b2, eps, bc1, bc2, omb1, omb2 = (s_ref[k] for k in range(9))
    g = g_ref[:] + wd * p_ref[:]
    mu = omb1 * g + b1 * mu_ref[:]
    nu = omb2 * (g * g) + b2 * nu_ref[:]
    mu_hat = mu / bc1
    nu_hat = nu / bc2
    vmax = jnp.maximum(vm_ref[:], nu_hat)
    upd = mu_hat / (jnp.sqrt(vmax) + eps)
    po_ref[:] = p_ref[:] - lr * upd
    muo_ref[:] = mu
    nuo_ref[:] = nu
    vmo_ref[:] = vmax


def _leaf_update_pallas(scalars, p, g, mu, nu, vmax, interpret: bool):
    n0, n1 = p.shape
    # ~0.5 MB f32 per buffer: 9 double-buffered VMEM buffers (5 in + 4 out)
    # must fit the DEFAULT 16 MiB scoped-vmem budget (the update is pure HBM
    # bandwidth — small blocks pipeline fine). Block sublane dim must be a
    # multiple of 8 or equal to n0 (Mosaic block-shape rule — a 341-row
    # block over the (30522, 768) embedding table fails to lower).
    limit = (1 << 17) // n1
    block_rows = n0 if n0 <= limit else max(8, (limit // 8) * 8)
    grid = (pl.cdiv(n0, block_rows),)
    spec = pl.BlockSpec((block_rows, n1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _adam_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 5,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct(p.shape, jnp.float32)] * 4,
        # NO input_output_aliases: through the axon remote-TPU backend an
        # aliased pallas custom call poisons the runtime on (re-)execution
        # (INVALID_ARGUMENT on every subsequent dispatch — measured, see
        # CLAUDE.md). jit-level donation still reuses the buffers; aliasing
        # here would only save a transient allocation, not bandwidth.
        interpret=interpret,
    )(scalars, p, g, mu, nu, vmax)
    return outs  # p, mu, nu, vmax


def _leaf_update_jnp(scalars, p, g, mu, nu, vmax):
    lr, wd, b1, b2, eps, bc1, bc2, omb1, omb2 = scalars
    g = g + wd * p
    mu = omb1 * g + b1 * mu
    nu = omb2 * (g * g) + b2 * nu
    vmax = jnp.maximum(vmax, nu / bc2)
    upd = (mu / bc1) / (jnp.sqrt(vmax) + eps)
    return p - lr * upd, mu, nu, vmax


def _kernel_eligible(leaf) -> bool:
    return leaf.ndim == 2 and leaf.shape[-1] % 128 == 0 and leaf.dtype == jnp.float32


def resolve_fused_update(optim_cfg, mesh=None) -> str | None:
    """Single policy point for engine/bench: fused Adam path, or None.

    Returns "kernel" (the Pallas pass), "jnp" (the same single-expression
    update per leaf, no custom call — one fused XLA loop per leaf instead of
    the optax chain's multi-tree passes), or None (optax chain).

    Only amsgrad is fused, and the fused paths are single-device (under a
    mesh the optax chain is GSPMD-partitioned). "auto" currently resolves
    to None even on TPU: combined with the fused trunk kernels in one
    program the adam custom calls crash the axon remote worker (round-3
    investigation, see RESULTS.md); every component-level configuration
    passes, so "auto" flips to "kernel" once that interaction is isolated.
    "on" forces the kernel for tests/microbenches; "jnp" selects the
    crash-safe fused expression (A/B'able vs the chain on chip).
    """
    if not optim_cfg.amsgrad or mesh is not None:
        return None
    fu = optim_cfg.fused_update
    if fu == "on":
        return "kernel"
    if fu == "jnp":
        return "jnp"
    return None  # "auto" | "off"


class FusedAdam:
    """Drop-in for (make_optimizer(...).update + optax.apply_updates) with
    the same hyperparameters and the freezing-mask semantics of
    optax.multi_transform+set_to_zero (frozen leaves: params AND moments
    untouched)."""

    def __init__(self, cfg, trainable_mask=None, interpret: bool | None = None,
                 path: str = "kernel"):
        from kindergarten_vq_vae_tpu.train.optim import make_lr_schedule

        self.b1, self.b2, self.eps = 0.9, 0.999, 1e-8
        self.wd = cfg.weight_decay
        schedule = make_lr_schedule(cfg)
        self.schedule = schedule if callable(schedule) else (lambda _: schedule)
        self.mask = trainable_mask
        self.interpret = interpret
        # "kernel": the Pallas pass for eligible leaves; "jnp": the same
        # formula as one fused XLA expression per leaf (no custom call —
        # safe to compose with the fused trunk kernels on axon)
        assert path in ("kernel", "jnp"), path
        self.path = path

    def init(self, params) -> FusedAdamState:
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return FusedAdamState(jnp.zeros([], jnp.int32), zeros(), zeros(), zeros())

    def apply(self, grads, state: FusedAdamState, params):
        # interpret=None -> pallas on TPU, jnp path elsewhere (interpret-mode
        # pallas is slow and the jnp formula is identical); interpret=True ->
        # force the pallas kernel in interpreter mode (CPU kernel tests)
        interpret = (jax.default_backend() != "tpu"
                     if self.interpret is None else self.interpret)
        use_kernel = (self.path == "kernel"
                      and (jax.default_backend() == "tpu" or self.interpret is True))
        count_inc = optax.safe_increment(state.count)
        cf = count_inc.astype(jnp.float32)
        # identical expressions to optax.tree.bias_correction (f32 power)
        bc1 = 1.0 - jnp.power(jnp.float32(self.b1), cf)
        bc2 = 1.0 - jnp.power(jnp.float32(self.b2), cf)
        lr = jnp.asarray(self.schedule(state.count), jnp.float32)
        scalars = jnp.stack([
            lr, jnp.float32(self.wd), jnp.float32(self.b1), jnp.float32(self.b2),
            jnp.float32(self.eps), bc1, bc2,
            jnp.float32(1 - self.b1), jnp.float32(1 - self.b2),
        ])

        mask = self.mask or jax.tree_util.tree_map(lambda _: True, params)
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_vm = treedef.flatten_up_to(state.nu_max)
        flat_m = treedef.flatten_up_to(mask)

        new_p, new_mu, new_nu, new_vm = [], [], [], []
        for p, g, mu, nu, vm, m in zip(flat_p, flat_g, flat_mu, flat_nu, flat_vm, flat_m):
            if not m:
                new_p.append(p); new_mu.append(mu); new_nu.append(nu); new_vm.append(vm)
                continue
            if _kernel_eligible(p) and use_kernel:
                out = _leaf_update_pallas(scalars, p, g, mu, nu, vm, interpret)
            else:
                out = _leaf_update_jnp(scalars, p.astype(jnp.float32), g, mu, nu, vm)
            new_p.append(out[0]); new_mu.append(out[1])
            new_nu.append(out[2]); new_vm.append(out[3])

        unflat = treedef.unflatten
        return unflat(new_p), FusedAdamState(
            count_inc, unflat(new_mu), unflat(new_nu), unflat(new_vm)
        )
