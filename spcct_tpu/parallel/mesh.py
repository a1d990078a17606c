# mesh.py — device mesh construction and sharding rules.
#
# The reference's distributed story is vestigial NCCL scaffolding pinned to
# devices=1 (reference train.py:28-29,1489-1498; SURVEY.md §2.8). The
# TPU-native replacement is declarative: one Mesh(('data','model')) over the
# slice's ICI, batches sharded over 'data', parameters replicated (or sharded
# over 'model' when a recipe opts in), and jit/XLA inserts the gradient
# all-reduce and metric psums from the sharding annotations — no hand-written
# communication layer.
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MESH_DATA, MESH_MODEL

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: Optional[int] = None) -> Mesh:
    """Build a ('data','model') mesh over all visible devices.

    Defaults: model axis 1, data axis all devices — pure data parallelism,
    the axis that actually matters at reference scale (largest model is tens
    of M params; SURVEY.md §2.8). Env overrides SPCCT_MESH_DATA/MODEL.
    """
    n_model = int(n_model or MESH_MODEL or 1)
    devices = jax.devices()
    if not n_data:
        n_data = MESH_DATA or (len(devices) // n_model)
    n_data = max(1, int(n_data))
    dev_array = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[: n_data * n_model]
    )
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a host batch with the batch axis sharded over 'data'.

    Multi-host aware: with >1 controller process, each host feeds only its
    contiguous slice of the global batch (per-host sharded input feeding —
    jax.make_array_from_process_local_data assembles the global array).
    The caller passes the same globally-ordered batch on every host; the
    slice-then-assemble keeps host->device traffic to 1/process_count.
    """
    if jax.process_count() > 1:
        from .distributed import make_global_batch, process_shard

        gb = jax.tree.leaves(batch)[0].shape[0]
        sl = process_shard(gb)
        local = jax.tree.map(lambda a: np.asarray(a)[sl], batch)
        return make_global_batch(local, mesh, gb)
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def shard_params_over_model_axis(params, mesh: Mesh):
    """Tensor-parallel sharding rule: shard the output-channel (last) axis of
    large kernels over the 'model' axis; everything else replicated.

    3D-conv channel sharding is the natural TP axis for this workload
    (SURVEY.md §2.8): kernels are (kd,kh,kw,cin,cout) channels-last, so
    P(..., 'model') on cout splits both the conv GEMM and its activations;
    XLA inserts the all-gathers/reduce-scatters where layers disagree.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(p):
        if n_model > 1 and p.ndim >= 2 and p.shape[-1] % n_model == 0 and p.shape[-1] >= 2 * n_model:
            spec = P(*([None] * (p.ndim - 1) + [MODEL_AXIS]))
        else:
            spec = P()
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(rule, params)


def pad_batch_to_mesh(x: np.ndarray, y: np.ndarray, mesh: Mesh):
    """Pad a host batch so B divides the data axis; padded samples carry
    all-ignore labels so they contribute nothing to loss or metrics."""
    n = mesh.shape[DATA_AXIS]
    b = x.shape[0]
    pad = (-b) % n
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        y_pad = np.full((pad,) + y.shape[1:], 255, dtype=y.dtype)
        y = np.concatenate([y, y_pad], axis=0)
    return x, y
