"""Cluster (superpixel centroid) state as a struct-of-arrays pytree.

The reference keeps a C array ``Cluster[K]`` with fields
``{y,x,r,g,b,a, number:u16, is_active:u8, is_updatable:u8, num_members:u32}``
(``/root/reference/src/fast-slic-common.h:10-23``) owned by the Cython
``SlicModel`` and mutated in place by every ``Context``.  Here the same state
is an immutable struct-of-arrays pytree — trivially checkpointable, vmappable
over a batch of frames, and shardable over a device mesh.

``Cluster.a`` (alpha) is never read by the reference; it is not carried.
``number`` is implicit (== array index) but materialized for API parity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import numpy as np

from .config import MAX_NUM_COMPONENTS


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Clusters:
    """Struct-of-arrays centroid state.  All fields have leading dim K.

    y, x, r, g, b are float32 (the reference stores floats even on the
    quantized path; quantization happens at update time via round_int,
    context.cpp:368-373).
    """

    y: Any
    x: Any
    r: Any
    g: Any
    b: Any
    num_members: Any   # uint32
    is_active: Any     # int32 (0/1)
    is_updatable: Any  # int32 cooldown counter (preemptive.h:32,59-67)

    @property
    def K(self) -> int:
        return self.y.shape[-1]

    def as_numpy(self) -> "Clusters":
        return Clusters(*(np.asarray(f) for f in dataclasses.astuple(self)))

    def copy(self) -> "Clusters":
        return Clusters(*(np.array(f, copy=True) for f in dataclasses.astuple(self)))


def zeros(K: int) -> Clusters:
    """All-zero state, matching the memset in SlicModel.__cinit__
    (cfast_slic.pyx:38-39)."""
    f = np.zeros([K], np.float32)
    return Clusters(
        y=f.copy(), x=f.copy(), r=f.copy(), g=f.copy(), b=f.copy(),
        num_members=np.zeros([K], np.uint32),
        is_active=np.zeros([K], np.int32),
        is_updatable=np.zeros([K], np.int32),
    )


def initialize_clusters(image: np.ndarray, K: int) -> Clusters:
    """Grid seeding, exactly reproducing BaseContext::initialize_clusters
    (``/root/reference/src/context.cpp:43-97``).

    * ``n_y = floor(sqrt(K))`` rows; the remainder K % n_y is distributed to
      every other row starting at row 0 (context.cpp:45-57).
    * centers at cell midpoints ``(i + h/2, j + w/2)``, clamped in-bounds;
      overflow clusters are dumped at the image center (context.cpp:59-86).
    * seed colors sampled from the *raw* image at the center pixel
      (context.cpp:88-96).

    image: uint8 [H, W, 3].  Pure host-side integer math (init is cheap and
    happens once per model).
    """
    H, W = int(image.shape[0]), int(image.shape[1])
    state = zeros(K)
    if H <= 0 or W <= 0 or K <= 0:
        return state

    n_y = int(math.sqrt(K))
    n_xs = [K // n_y] * n_y
    remainder = K % n_y
    row = 0
    while remainder > 0:
        remainder -= 1
        n_xs[row] += 1
        row += 2
        if row >= n_y:
            row = 1 % n_y

    def ceil_int(a, b):
        return (a + b - 1) // b

    ys = np.zeros([K], np.int64)
    xs = np.zeros([K], np.int64)
    h = ceil_int(H, n_y)
    acc_k = 0
    for i in range(0, H, h):
        w = ceil_int(W, n_xs[min(i // h, n_y - 1)])
        for j in range(0, W, w):
            if acc_k >= K:
                break
            ys[acc_k] = min(max(i + h // 2, 0), H - 1)
            xs[acc_k] = min(max(j + w // 2, 0), W - 1)
            acc_k += 1
    while acc_k < K:
        ys[acc_k] = H // 2
        xs[acc_k] = W // 2
        acc_k += 1

    img = np.asarray(image)
    state.y = ys.astype(np.float32)
    state.x = xs.astype(np.float32)
    state.r = img[ys, xs, 0].astype(np.float32)
    state.g = img[ys, xs, 1].astype(np.float32)
    state.b = img[ys, xs, 2].astype(np.float32)
    state.is_active = np.ones([K], np.int32)
    state.is_updatable = np.ones([K], np.int32)
    state.num_members = np.zeros([K], np.uint32)
    return state


def clusters_to_dicts(state: Clusters):
    """API-parity view: list of dicts like SlicModel.clusters
    (cfast_slic.pyx:51-66)."""
    s = state.as_numpy()
    return [
        dict(
            number=k,
            yx=(float(s.y[k]), float(s.x[k])),
            color=(float(s.r[k]), float(s.g[k]), float(s.b[k])),
            num_members=int(s.num_members[k]),
        )
        for k in range(s.K)
    ]


def dicts_to_clusters(dicts) -> Clusters:
    """Inverse of :func:`clusters_to_dicts`, mirroring the setter semantics
    of SlicModel._set_clusters (cfast_slic.pyx:68-98): `number` is re-derived
    from position; y/x/r/g/b are cast through the same integer types the
    Cython code uses (uint16 coords, uint8 colors)."""
    K = len(dicts)
    if K > MAX_NUM_COMPONENTS:
        raise ValueError("num_components cannot exceed 65534")
    state = zeros(K)
    for i, d in enumerate(dicts):
        y, x = d["yx"]
        r, g, b = d["color"]
        state.y[i] = np.float32(np.uint16(y))
        state.x[i] = np.float32(np.uint16(x))
        state.r[i] = np.float32(np.uint8(r))
        state.g[i] = np.float32(np.uint8(g))
        state.b[i] = np.float32(np.uint8(b))
        state.num_members[i] = np.uint32(d["num_members"])
    # The reference leaves is_active/is_updatable unset here (malloc'd);
    # iterate() would treat user-set clusters as active, so we make that
    # explicit.
    state.is_active[:] = 1
    state.is_updatable[:] = 1
    return state


def to_yxmrgb(state: Clusters) -> np.ndarray:
    """[K, 6] float array of (y, x, num_members, r, g, b)
    (cfast_slic.pyx:100-113)."""
    s = state.as_numpy()
    return np.stack(
        [s.y, s.x, s.num_members.astype(np.float32), s.r, s.g, s.b], axis=1
    ).astype(np.float64)
