"""Device mesh helpers.

The reference's only parallelism is data parallelism over NCCL
(SURVEY.md §2.8).  Here DP rides ICI via `shard_map` over a 1-D mesh; the
axis layout leaves room for a 2-level ('dcn', 'dp') mesh for multi-slice
scale-out: collectives inside a slice ride ICI, the optional outer axis DCN.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DP_AXIS = "dp"
DCN_AXIS = "dcn"


def make_mesh(
    n_devices: tp.Optional[int] = None,
    devices: tp.Optional[tp.Sequence[jax.Device]] = None,
    dcn_slices: int = 1,
) -> Mesh:
    """1-D data-parallel mesh, or ('dcn', 'dp') when dcn_slices > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"requested {n_devices} devices but only {len(devices)} visible "
            "(forgot jax_num_cpu_devices / xla_force_host_platform_device_count?)"
        )
        devices = devices[:n_devices]
    if dcn_slices > 1:
        assert len(devices) % dcn_slices == 0
        arr = np.array(devices).reshape(dcn_slices, -1)
        return Mesh(arr, (DCN_AXIS, DP_AXIS))
    return Mesh(np.array(devices), (DP_AXIS,))


def dp_axis_names(mesh: Mesh) -> tp.Union[str, tp.Tuple[str, ...]]:
    """The data-parallel axis name(s) of a mesh: 'dp' on a 1-D mesh,
    ('dcn', 'dp') on a 2-level multi-slice mesh.  Pass the result as
    `axis_name` to the step builders — jax collectives accept tuples and
    reduce over the combined axes."""
    names = tuple(n for n in (DCN_AXIS, DP_AXIS) if n in mesh.axis_names)
    return names if len(names) > 1 else names[0]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(dp_axis_names(mesh)))


def shard_batch(mesh: Mesh, batch):
    """Place a host numpy batch with its leading axis split over dp."""
    return jax.device_put(batch, batch_sharded(mesh))
