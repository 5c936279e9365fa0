"""Device mesh helpers for the batched/sharded SLIC pipeline.

The reference's two parallelism levels — OpenMP threads over rows and SIMD
lanes within a row (SURVEY.md §2.3) — map onto a TPU as:

* ``data`` mesh axis: independent frames of a video batch (the primary win
  for the 720p@60fps use-case) — pure data parallelism, no communication
  except the initial shard.
* ``space`` mesh axis: rows of a single large image.  The +-S assignment
  window and the CCA seams need cross-shard halos; with jit + sharding
  constraints XLA/GSPMD inserts the collectives (halo exchange for the
  shifted/windowed ops, psum for the K-bin segment sums — the analog of the
  reference's critical-section accumulator merge, context.cpp:345-353).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              space: int | None = None) -> Mesh:
    """Build a (data, space) mesh over the first n_devices devices.

    Defaults: all devices on the data axis (video batching), space=1.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None and space is None:
        data, space = n_devices, 1
    elif data is None:
        data = n_devices // space
    elif space is None:
        space = n_devices // data
    if data * space != n_devices:
        raise ValueError(
            f"mesh {data}x{space} != {n_devices} devices")
    arr = np.array(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, ...] arrays: batch over `data`, rows over `space`."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
