"""Device mesh construction for DSP workloads.

The reference has no multi-device execution (SURVEY.md §2.9); this
package provides the mandated TPU equivalents. Mesh axes:

  * "channel" — data parallelism over independent audio channels
    (the analog of the reference's array-of-mono-processors pattern,
    e.g. `measure/loudness/meter.go:80-93`). No communication.
  * "time"   — sequence parallelism over the time axis. Requires halo
    exchange for FIR/overlap-save history and carry propagation for
    IIR scans (`parallel/sharded.py`).

On a pod slice, lay "time" along ICI-adjacent devices so halo/carry
ppermutes ride ICI; "channel" can span DCN since it never communicates.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh. Default: all devices on a single "channel" axis.

    axis_sizes maps axis name -> size; the product must equal the
    device count (one axis may be -1 to infer).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"channel": n}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if sizes.count(-1) == 1:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh axes {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def channel_sharding(mesh: Mesh, ndim: int, channel_axis: int = 0,
                     mesh_axis: str = "channel") -> NamedSharding:
    """NamedSharding placing `channel_axis` of an ndim array on the mesh
    channel axis, everything else replicated."""
    spec = [None] * ndim
    spec[channel_axis] = mesh_axis
    return NamedSharding(mesh, P(*spec))
