"""Multi-host (DCN) layer: two local CPU processes form one jax.distributed
job, each loads only its per-process batch shard, and the global sharded
computation matches the single-process ground truth.

This is the documented multi-process test from VERDICT #5: the reference has
no distributed training at all (SURVEY §5.8); this layer is added capability.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_WORKER = r"""
import os, sys
sys.path.insert(0, "@REPO@")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
from kindergarten_vq_vae_tpu.parallel.mesh import init_distributed, make_mesh, shard_batch
init_distributed(coordinator_address=sys.argv[2], num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import jax.numpy as jnp
from kindergarten_vq_vae_tpu.data.dataset import BatchIterator, DSentences

rng = np.random.default_rng(0)
ids = rng.integers(1, 100, (64, 12)).astype(np.int32)
ds = DSentences(input_ids=ids, attention_mask=np.ones((64, 12), np.int32))

it = BatchIterator(ds, batch_size=16, shuffle=True, seed=3,
                   process_index=pid, process_count=2)
mesh = make_mesh((8,), ("dp",))
totals = []
with mesh:
    for batch in it:
        assert batch["input_ids"].shape == (8, 12)  # local shard of 16
        gb = shard_batch(mesh, {k: v for k, v in batch.items() if k != "index"})
        assert gb["input_ids"].shape == (16, 12)    # global view
        totals.append(int(jax.jit(lambda x: jnp.sum(x))(gb["input_ids"])))
print("TOTALS", totals, flush=True)
"""


def test_two_process_dp_matches_single():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    workers = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        workers.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER.replace("@REPO@", REPO), str(pid), coord],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for w in workers:
        out, err = w.communicate(timeout=300)
        assert w.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    # both processes must see the same global sums
    t0 = [l for l in outs[0].splitlines() if l.startswith("TOTALS")][0]
    t1 = [l for l in outs[1].splitlines() if l.startswith("TOTALS")][0]
    assert t0 == t1

    # ground truth: single-process iteration over the full batch
    from kindergarten_vq_vae_tpu.data.dataset import BatchIterator, DSentences

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 100, (64, 12)).astype(np.int32)
    ds = DSentences(input_ids=ids, attention_mask=np.ones((64, 12), np.int32))
    expected = [
        int(b["input_ids"].sum())
        for b in BatchIterator(ds, batch_size=16, shuffle=True, seed=3)
    ]
    assert t0 == f"TOTALS {expected}"
