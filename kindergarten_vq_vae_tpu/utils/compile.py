"""Compile-option helpers for TPU jits.

The fused whole-layer kernels (ops/layer_pallas.py) run as an unrolled
per-layer loop (a rolled lax.scan was measured slower and removed); XLA's
buffer assignment still places the backward kernel's output buffers (dx +
the per-layer dW accumulators, ~40 MB at bert-base) in VMEM around the
kCustom fusions, which trips the default 16 MiB scoped-vmem
limit. The limit is a proto-backed XLA option, so it can be raised
per-compile via jax.jit(compiler_options=...) — the env-var route
(XLA_FLAGS) does NOT work here: the client-side parser rejects TPU-only
flags, and the remote-compile terminal overrides the env anyway
(CLAUDE.md).
"""

from __future__ import annotations

import os

import jax

SCOPED_VMEM_KIB = int(os.environ.get("KVT_SCOPED_VMEM_KIB", "121500"))
# ~118.7 MiB default (the 384-row bwd tile needs ~118 MiB and the rest of
# the program ~9 MiB of the chip's 128 MiB). The fused-layer custom calls
# are wrapped in kCustom fusions governed by THIS limit (the per-kernel
# pallas vmem_limit_bytes is not consulted), and the backward kernel at
# TB=16 needs ~70-100 MiB.


def tpu_compiler_options() -> dict:
    """Options for jits that may contain fused-layer kernels. Empty off-TPU
    (the CPU backend rejects unknown TPU options)."""
    if jax.default_backend() != "tpu":
        return {}
    return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}


def tpu_jit(fn, *bound):
    """jit with the raised scoped-vmem limit the fused-layer kernels need;
    no-op off-TPU. ``bound`` values (e.g. the param tree) are passed as
    leading jit ARGUMENTS, not closures: closed-over arrays lower to HLO
    constants, and a bert-base param tree (~880 MB) blows the remote-compile
    service's request-size limit (HTTP 413). Shared by every inference-side
    caller (analyses, serving)."""
    import functools

    return functools.partial(jax.jit(fn, compiler_options=tpu_compiler_options()), *bound)
