"""Multi-host execution (SURVEY.md §5 "Distributed communication backend").

The reference scales by running independent Docker containers
(/root/reference/README.md:28, Dockerfile:41); this framework instead runs
ONE SPMD program over every chip on every host:

- ``initialize()`` wires the processes into a single JAX runtime
  (jax.distributed — coordination service over gRPC; collectives ride ICI
  within a slice and DCN across slices);
- ``global_mesh()`` builds a ('data', 'model') Mesh over the GLOBAL device
  set;
- each host feeds only its local recordings via
  ``jax.make_array_from_process_local_data`` (per-host IO, no host ever
  materialises the global batch);
- XLA inserts the cross-host collectives from the shardings (the only ones
  this workload needs are the psum of per-track window means and the
  replication all-gather of the PCM for the window gather);
- results are all-gathered host-side so process 0 can write the JSON
  (single-writer contract of the reference CLI, analyse.py:454-468).
"""

import json
import logging

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_analysis_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
):
    """Join this process to the multi-host runtime.

    On TPU pods all arguments default from the environment (JAX reads the
    TPU metadata); on CPU/GPU fleets pass them explicitly. Safe to call
    once per process, before any other JAX call.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    logging.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_multihost() -> bool:
    return jax.process_count() > 1


def global_mesh(model_parallel=1) -> Mesh:
    """('data', 'model') mesh over the global device set."""
    return make_mesh(devices=jax.devices(), model_parallel=model_parallel)


def make_global_batch(mesh: Mesh, local_array, spec=None):
    """Build a global jax.Array from this process's local batch block.

    ``local_array``'s leading axis is this process's slice of the global
    batch; the global leading axis is the concatenation over processes in
    process order. Single-process meshes short-circuit to a device_put.
    """
    local_array = np.asarray(local_array)
    if spec is None:
        spec = P("data", *([None] * (local_array.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    if not is_multihost():
        return jax.device_put(local_array, sharding)
    return jax.make_array_from_process_local_data(sharding, local_array)


def local_slice(global_array, axis=0):
    """This process's rows of a batch-sharded global array, as numpy, in
    global-index order (which is local feed order for arrays built with
    make_global_batch)."""
    if global_array.is_fully_addressable:
        return np.asarray(global_array)
    shards = sorted(
        global_array.addressable_shards,
        key=lambda s: s.index[axis].start or 0,
    )
    seen = set()
    parts = []
    for s in shards:
        start = s.index[axis].start or 0
        if start in seen:
            continue  # replicated copy of a block we already have
        seen.add(start)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts, axis=axis)


def local_offset(global_array, axis=0) -> int:
    """Smallest global index this process owns along `axis`."""
    if global_array.is_fully_addressable:
        return 0
    return min(s.index[axis].start or 0 for s in global_array.addressable_shards)


def replicated_np(global_array):
    """Numpy view of a fully-replicated global array (every process holds
    the whole value)."""
    if global_array.is_fully_addressable:
        return np.asarray(global_array)
    return np.asarray(global_array.addressable_shards[0].data)


def allgather_host_values(value):
    """All-gather a small per-process int across processes (host path).

    Returns a list of length process_count, indexed by process. Uses a tiny
    device all-gather so it needs no side channel.
    """
    if not is_multihost():
        return [int(value)]
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(np.asarray([int(value)], np.int64))
    return [int(v) for v in np.asarray(out).reshape(-1)]


def allgather_results(results_local):
    """All-gather a per-process list of JSON-able objects; returns the
    concatenated global list (process order) on every process.

    This is the host-side analog of the reference's "one container, one
    JSON" contract: after it, process 0 can write every recording's result.
    """
    if not is_multihost():
        return list(results_local)
    from jax.experimental import multihost_utils

    blob = json.dumps(results_local).encode()
    n = len(blob)
    lens = allgather_host_values(n)
    max_n = max(lens)
    padded = np.zeros(max_n, np.uint8)
    padded[:n] = np.frombuffer(blob, np.uint8)
    gathered = multihost_utils.process_allgather(padded)
    gathered = np.asarray(gathered).reshape(jax.process_count(), max_n)
    out = []
    for p in range(jax.process_count()):
        out.extend(json.loads(bytes(gathered[p, : lens[p]]).decode()))
    return out


def replicate(mesh: Mesh, global_array):
    """Replicate a (possibly sharded) global array onto every device via one
    XLA all-gather — the SPMD way to get gather-everywhere operands."""
    return jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P())
    )(global_array)
