# distributed.py — multi-host (multi-process) scale-out.
#
# The reference never runs distributed (SURVEY.md §2.8: NCCL env vars +
# devices=1). The TPU-native scale-out path is standard JAX multi-controller:
# every host runs the same program, `jax.distributed.initialize` wires the
# coordination service, the Mesh spans all global devices, and each host
# feeds only its own shard of every batch (`make_global_batch`). XLA emits
# the cross-host collectives from the sharding annotations; gradients ride
# ICI within a slice and DCN across slices without code changes here.
#
# Launch contract (all env vars optional — absent means single-process):
#   SPCCT_COORDINATOR   host:port of process 0 (e.g. "10.0.0.1:8476")
#   SPCCT_NUM_PROCESSES total process count
#   SPCCT_PROCESS_ID    this process's rank
# On TPU pods with the standard runtime metadata, plain
# `jax.distributed.initialize()` autodetects all three; the env vars exist
# for CPU simulation and bare-metal launches.
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize_from_env() -> bool:
    """Call jax.distributed.initialize when a multi-process launch is
    requested. Returns True when running multi-process.

    Must run before the first jax backend touch in the process.
    """
    import jax

    coord = os.getenv("SPCCT_COORDINATOR")
    nproc = os.getenv("SPCCT_NUM_PROCESSES")
    pid = os.getenv("SPCCT_PROCESS_ID")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid or 0),
        )
        return True
    if os.getenv("SPCCT_AUTO_DISTRIBUTED") == "1":
        # TPU pod runtime: all parameters autodetected from metadata.
        jax.distributed.initialize()
        return True
    return False


def process_shard(n_items: int, *, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> slice:
    """Contiguous per-host slice of a globally-ordered index range.

    Every host must see the same n_items and iterate the same global order;
    this returns the half-open slice this host is responsible for loading.
    Requires process_count | n_items (pad the global batch first —
    pad_batch_to_mesh handles the model side).
    """
    import jax

    pc = process_count if process_count is not None else jax.process_count()
    pi = process_index if process_index is not None else jax.process_index()
    assert n_items % pc == 0, (
        f"global batch {n_items} must divide process count {pc}; pad first")
    per = n_items // pc
    return slice(pi * per, (pi + 1) * per)


def make_global_batch(local_arrays, mesh, global_batch: int):
    """Assemble global device arrays from per-host shards.

    `local_arrays`: pytree of np arrays holding ONLY this host's contiguous
    slice of the global batch (as given by `process_shard`). Returns a pytree
    of jax.Arrays with global shape (global_batch, ...) sharded over the
    mesh's 'data' axis — the input contract of the jitted train step.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))

    def one(a):
        a = np.asarray(a)
        global_shape = (global_batch,) + a.shape[1:]
        return jax.make_array_from_process_local_data(sh, a, global_shape)

    return jax.tree.map(one, local_arrays)


def global_mesh(n_model: int = 1):
    """Mesh over ALL global devices (multi-host aware). The 'data' axis spans
    hosts; 'model' stays within a host so TP collectives ride ICI."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    devices = jax.devices()  # global device list in multi-controller mode
    n_data = len(devices) // n_model
    dev_array = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[: n_data * n_model])
    return Mesh(dev_array, ("data", "model"))
