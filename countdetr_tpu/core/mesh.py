"""Device mesh + sharding helpers.

The reference's distribution layer is torch.distributed + NCCL collectives
(reference util/misc.py:399-436) with DDP wrapping (main.py:206-208). On TPU
none of that machinery survives: JAX owns rendezvous, a jax.sharding.Mesh
spans the slice, pjit partitions the train step, and the all_reduce of
num_boxes (reference anchor_detr.py:321-325) falls out of computing losses on
globally-sharded arrays. Collectives ride ICI; multi-host init is
jax.distributed.initialize.

The default layout is pure data-parallel over one 'data' axis — the model is
~37M params, so DP is the right parallelism; the mesh is N-D-ready for
future tensor axes (mesh_axes in TrainConfig).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,), axis_names: Sequence[str] = ("data",), devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    dev_array = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put array leaves of a host batch with batch-dim sharding.

    Multi-process: each host holds only ITS slice of the global batch (the
    Batcher's process stride), so the global array is assembled with
    make_array_from_process_local_data — the global batch dim is
    local_batch * process_count."""
    sh = batch_sharding(mesh, axis)
    multiproc = jax.process_count() > 1

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            if multiproc:
                return jax.make_array_from_process_local_data(
                    sh, np.asarray(x)
                )
            return jax.device_put(x, sh)
        return x

    return {
        k: (put(v) if not isinstance(v, (list, tuple, dict)) and k != "bucket" else v)
        for k, v in batch.items()
    }


def replicate(tree, mesh: Mesh):
    """Replicate every array leaf over the mesh (multi-process safe) — used
    for params/optimizer state so jit sees global arrays on all hosts.
    Scalar (ndim-0) leaves — optimizer step counts etc. — go through a
    rank-1 detour because make_array_from_process_local_data wants a
    shaped leading dim."""
    sh = replicated(mesh)

    def rep(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        arr = np.asarray(x)
        if arr.ndim == 0:
            g = jax.make_array_from_process_local_data(sh, arr.reshape(1))
            return g.reshape(())
        return jax.make_array_from_process_local_data(sh, arr)

    return jax.tree_util.tree_map(rep, tree)


def is_main_process() -> bool:
    return jax.process_index() == 0


# ---------------------------------------------------------------------------
# Tensor-parallel sharding rules (capability extension — SURVEY.md 2.8: the
# model is ~37M params so TP is unnecessary for capacity; the rules exist so
# the framework scales the standard way: annotate shardings, let the SPMD
# partitioner insert the collectives).
# ---------------------------------------------------------------------------


def tp_param_spec(path, value, axis: str = "model") -> P:
    """PartitionSpec for one param: attention head projections and FFN hidden
    dims shard over the tensor axis; everything else replicates.

    Layouts (torch-packed, see models/transformer.py):
      in_proj_weight (kE, E): rows pack per-head outputs -> P(axis, None)
      out_proj_weight (E, E): contraction dim is the sharded head dim ->
        P(None, axis) (XLA inserts the all-reduce after the contraction)
      ffn linear1 (d_ffn, E) -> P(axis, None); linear2 (E, d_ffn) ->
        P(None, axis)
    """
    keys = [str(getattr(p, "key", p)) for p in path]
    joined = "/".join(keys)
    leaf = keys[-1]
    mod = keys[-2] if len(keys) >= 2 else ""
    nd = getattr(value, "ndim", 0)

    if leaf == "in_proj_weight" and nd == 2:
        return P(axis, None)
    if leaf == "in_proj_bias":
        return P(axis)
    if leaf == "out_proj_weight" and nd == 2:
        return P(None, axis)
    if mod == "linear1" and leaf == "weight" and nd == 2:
        return P(axis, None)
    if mod == "linear1" and leaf == "bias":
        return P(axis)
    if mod == "linear2" and leaf == "weight" and nd == 2:
        return P(None, axis)
    return P()


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put every param with its TP sharding over `mesh`."""
    import jax.tree_util as jtu

    def put(path, v):
        spec = tp_param_spec(path, v, axis)
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jtu.tree_map_with_path(put, params)


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Multi-host initialization — the reference's init_distributed_mode
    (util/misc.py:399-436: env:// or SLURM discovery + NCCL init) maps to
    jax.distributed.initialize; after it, collectives ride ICI within a
    slice and DCN across slices with no further user code.

    No-ops when neither args nor the standard env vars are present
    (single-process run)."""
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _weighted_reduce(all_vals: np.ndarray) -> np.ndarray:
    """Weighted per-column mean of an (n_hosts, n_metrics+1) matrix whose
    last column is each host's weight. Accumulates in f64 so large sample
    counts (1e5+ per host, many hosts) don't lose precision in the weighted
    sum, and zeroes out zero-weight rows so a NaN metric on an all-padding
    host (NaN * 0 = NaN) can't poison the mean. A NaN on a host with real
    samples still propagates, as it should. Pure numpy — unit-tested
    directly (tests/test_sharding.py) without spawning processes."""
    all_vals = np.asarray(all_vals, np.float64)
    w = all_vals[:, -1:]
    vals = np.where(w > 0, all_vals[:, :-1], 0.0)
    total_w = max(float(w.sum()), 1e-9)
    return (vals * w).sum(axis=0) / total_w


def gather_metrics(metrics: dict, weight: float = 1.0) -> dict:
    """Weighted-average scalar metrics across hosts (the reference's
    reduce_dict / MetricLogger.synchronize_between_processes,
    util/misc.py:133-157,49-60). `weight` is the host's REAL (non-padding)
    sample count for this window: with the global batch schedule, a host
    whose slice of the tail batch is mostly padding must not contribute a
    full-weight mean (its masked losses average over fewer real samples).
    Single-process: identity."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics.keys())
    # Transport UNWEIGHTED values + the weight (f32 over the wire — jnp
    # would silently downcast f64 anyway); reduce host-side in f64.
    vec = np.array(
        [float(metrics[k]) for k in keys] + [max(weight, 0.0)], np.float32
    )
    all_vals = np.asarray(multihost_utils.process_allgather(vec)).reshape(
        jax.process_count(), -1
    )
    return dict(zip(keys, _weighted_reduce(all_vals).tolist()))
