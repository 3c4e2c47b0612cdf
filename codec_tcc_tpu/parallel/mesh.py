"""Device mesh construction and multi-host initialization.

The reference is strictly single-process (SURVEY §2.5: no DP/TP/PP/SP/EP, no
communication backend — the only IPC is ``subprocess`` pipes to codec
binaries). Scale-out here is designed fresh, TPU-native: a
``jax.sharding.Mesh`` whose axes are the two parallel dimensions this
workload actually has (SURVEY §2.5 disposition):

* ``dp``   — batch of independent images (data parallelism);
* ``tile`` — spatial tiling of a single large image/volume (the honest
  analog of sequence parallelism for this domain, SURVEY §5).

Collectives ride ICI within a slice via XLA (``psum`` for histogram and
metric reductions) — there is no NCCL/MPI layer to port.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "initialize_distributed", "P"]


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("dp",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    ``shape`` defaults to putting everything on the first axis; pass e.g.
    ``shape=(4, 2)`` with ``axes=("dp", "tile")`` for a 2-D layout.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    devs = np.array(devices[:n_devices])
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axes) - 1)
    return Mesh(devs.reshape(shape), axes)


def batch_sharding(mesh: Mesh, axis: str = "dp", ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``). No-op when JAX
    already knows its world (TPU pod metadata) or in single-process runs."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass
