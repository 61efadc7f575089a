"""Device mesh and sharding helpers.

The reference scales by running independent Docker containers (SURVEY.md §2);
this framework scales with a jax.sharding.Mesh: recordings/windows shard
along the ``data`` axis (DP — and, because windows are self-contained
overlapping chunks, this is also the sequence-parallel axis; SURVEY.md §5
"long-context"), while wide model dimensions can shard along ``model`` (TP).
XLA inserts the ICI collectives (psum/all_gather) from the shardings.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_parallel=1, devices=None) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch/window) axis along 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def model_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard one axis along 'model' (e.g. dense-head output features)."""
    spec = [None] * ndim
    spec[axis] = "model"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
