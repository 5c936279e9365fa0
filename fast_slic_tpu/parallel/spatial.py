"""Spatial parallelism: one image's rows sharded across a device mesh.

The reference's only intra-image parallelism is OpenMP rows + SIMD lanes;
the TPU analog for images too large for one chip is sharding H over the
``space`` mesh axis.  The gather-argmin assignment reads a +-S window, the
update reduces K-bin partial sums, and CCA propagates across strip seams —
with jit + sharding constraints, GSPMD materializes exactly the collectives
SURVEY.md §2.3 calls for: halo exchanges for the windowed/shifted ops and
psum-style reductions for the per-cluster accumulators (the analog of the
reference's critical-section merge, context.cpp:345-353).

This is the correctness-first path (validated against the single-device
pipeline on a virtual mesh); a hand-written shard_map + ppermute halo
implementation is the planned perf path for multi-chip single-image work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import cluster as cluster_lib
from ..config import RuntimeParams, StaticConfig
from ..pipeline import derive_scalars, iterate_graph
from .mesh import make_mesh


@functools.lru_cache(maxsize=16)
def _compiled_spatial(cfg: StaticConfig, max_iter: int, stride: int, mesh):
    img_sh = NamedSharding(mesh, P("space", None, None))
    lbl_sh = NamedSharding(mesh, P("space", None))

    def step(image, clusters, scalars):
        image = jax.lax.with_sharding_constraint(image, img_sh)
        out = iterate_graph(image, clusters, cfg, scalars, max_iter, stride)
        labels = jax.lax.with_sharding_constraint(out.labels, lbl_sh)
        return (labels, out.clusters, out.cca_tie, out.cand_overflow,
                out.raw_assignment)

    return jax.jit(step, in_shardings=(img_sh, None, None),
                   out_shardings=(lbl_sh, None, None, None, lbl_sh))


class ShardedSlic:
    """Single-image SLIC with rows sharded over the mesh's `space` axis.

    ``iterate`` returns numpy int16 labels with -1 for unassigned, exactly
    like ``Slic.iterate`` (the single-frame API contract)."""

    def __init__(self, num_components=400, compactness=10.0,
                 min_size_factor=0.25, subsample_stride=3,
                 convert_to_lab=True, variant="standard", arch="xla",
                 preemptive=False, preemptive_thres=0.05,
                 mesh: Mesh | None = None):
        self.num_components = num_components
        self.compactness = compactness
        self.min_size_factor = min_size_factor
        self.subsample_stride = subsample_stride
        self.convert_to_lab = convert_to_lab
        self.variant = variant
        self.arch = arch
        self.preemptive = preemptive
        self.preemptive_thres = preemptive_thres
        self.mesh = mesh if mesh is not None else make_mesh(space=None, data=1)
        self._state = None

    def iterate(self, image, max_iter=10):
        image = np.ascontiguousarray(image, np.uint8)
        H, W, _ = image.shape
        cfg = StaticConfig(H=H, W=W, K=self.num_components, arch=self.arch,
                           variant=self.variant,
                           convert_to_lab=self.convert_to_lab,
                           preemptive=self.preemptive)
        if self._state is None:
            self._state = jax.tree.map(
                jnp.asarray,
                cluster_lib.initialize_clusters(image, self.num_components))
        fn = _compiled_spatial(cfg, int(max_iter),
                               int(self.subsample_stride), self.mesh)
        scalars = derive_scalars(cfg, self.compactness, self.min_size_factor,
                                 self.preemptive_thres)
        labels, state, tie, ovf, raw = fn(jnp.asarray(image), self._state,
                                          scalars)
        if bool(np.asarray(ovf)):
            # candidate capacity exceeded (extreme centroid crowding):
            # single-frame runner escalation semantics (runner.py:48-56)
            from ..runner import run_iterate
            from ..config import RuntimeParams
            params = RuntimeParams(
                compactness=self.compactness,
                min_size_factor=self.min_size_factor,
                subsample_stride=int(self.subsample_stride),
                max_iter=int(max_iter))
            lab16, st, _ = run_iterate(cfg, image, jax.tree.map(
                np.asarray, self._state), params)
            self._state = jax.tree.map(jnp.asarray, st)
            return lab16
        if bool(np.asarray(tie)):
            # CCA top-K boundary-area tie: bit-parity host re-run
            # (ops/cca.py docstring, runner.py:60-82)
            from .. import native
            from ..config import UNASSIGNED
            raw_np = np.asarray(raw)
            if native.available():
                fixed = native.enforce_connectivity_native(
                    raw_np, cfg.K, int(scalars.thres))
            else:  # pragma: no cover - g++ present in supported envs
                from ..ops.cca import enforce_connectivity_xla
                fixed = np.asarray(enforce_connectivity_xla(
                    jnp.asarray(raw_np.astype(np.int32)), cfg.K,
                    jnp.int32(int(scalars.thres))))
            out = fixed.astype(np.int16)
            out[fixed == UNASSIGNED] = -1
            self._state = state
            return out
        self._state = state
        return np.asarray(labels).astype(np.int16)
