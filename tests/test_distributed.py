# Multi-host scale-out validation: 2 OS processes x 4 virtual CPU devices
# each form one 8-device global mesh; each process feeds only its own shard
# of the global batch (per-host sharded input feeding), and the jitted
# data-parallel train step must produce identical losses on both processes
# (the gradient all-reduce crosses the process boundary).
#
# Reference has no distributed execution at all (SURVEY.md §2.8); this is
# the TPU-native scale-out contract of spcct_tpu/parallel/distributed.py.
from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["SPCCT_REPO"])

from spcct_tpu.parallel.distributed import (
    initialize_from_env, process_shard, make_global_batch, global_mesh)

assert initialize_from_env(), "expected multi-process init"
assert jax.process_count() == 2
assert len(jax.devices()) == 8, jax.devices()

import jax.numpy as jnp
import numpy as np
from spcct_tpu.models.recipes import get_recipe
from spcct_tpu.train.loop import create_state, make_steps
from spcct_tpu.metrics import MetricAccum, metric_names

mesh = global_mesh()
assert mesh.shape["data"] == 8

recipe = get_recipe("PlainCore_UNet")
GB, F, HW = 8, 5, 32

# deterministic global batch; every process derives the same one
rng = np.random.default_rng(0)
gx = rng.standard_normal((GB, F, HW, HW, 1)).astype(np.float32)
gy = rng.integers(0, 13, (GB, F, HW, HW)).astype(np.int32)

sl = process_shard(GB)
batch = make_global_batch({"x": gx[sl], "y": gy[sl]}, mesh, GB)

with mesh:
    ex = jnp.zeros((1, F, HW, HW, 1), jnp.float32)
    state, opt = create_state(recipe, jax.random.PRNGKey(0), ex, 10, 10)
    train_step, _ = make_steps(recipe, opt, mesh=mesh)
    acc = MetricAccum.zeros(len(metric_names("x")))
    tree, acc = train_step(state.tree(), acc, batch["x"], batch["y"])
    tree, acc = train_step(tree, acc, batch["x"], batch["y"])
    loss = float(acc.sums[0])

print(f"DIST_OK rank={jax.process_index()} loss={loss:.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_mesh(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            SPCCT_REPO=REPO,
            SPCCT_COORDINATOR=f"127.0.0.1:{port}",
            SPCCT_NUM_PROCESSES="2",
            SPCCT_PROCESS_ID=str(rank),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=env_flags(env),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        # generous: the two children compile concurrently with whatever
        # else the suite (or a co-running training job) has on the host —
        # observed >600 s under full-suite load while passing in ~180 s
        # standalone
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "DIST_OK" in out, out
    # the all-reduced loss must be bitwise identical across processes
    losses = [line.split("loss=")[1] for out in outs
              for line in out.splitlines() if "DIST_OK" in line]
    assert len(losses) == 2 and losses[0] == losses[1], losses


def env_flags(env):
    base = env.get("XLA_FLAGS", "")
    # strip any existing device-count flag, then force 4 per process
    parts = [p for p in base.split() if "host_platform_device_count" not in p]
    parts.append("--xla_force_host_platform_device_count=4")
    return " ".join(parts)
