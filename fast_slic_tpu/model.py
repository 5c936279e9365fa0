"""SlicModel: the persistent, checkpointable state of a SLIC segmenter.

API-parity re-implementation of the Cython ``SlicModel``
(``/root/reference/cfast_slic.pyx:15-328``).  The only state that persists
between ``iterate`` calls is the cluster array; everything else is rebuilt
per call (the reference constructs a fresh C++ Context each time,
cfast_slic.pyx:150-260).  Here the cluster state is a numpy struct-of-arrays
(a JAX pytree on device during compute), so checkpoint/resume is just
save/load of five small arrays.
"""

from __future__ import annotations

import numpy as np

from . import cluster as cluster_lib
from .config import (
    MAX_NUM_COMPONENTS,
    RuntimeParams,
    StaticConfig,
    VARIANT_STANDARD,
    VARIANT_REAL,
    VARIANT_REAL_L2,
    VARIANT_REAL_NOQ,
    VARIANT_LSC,
    resolve_arch,
)

_REAL_DIST_TO_VARIANT = {
    "standard": VARIANT_REAL,
    "l2": VARIANT_REAL_L2,
    "noq": VARIANT_REAL_NOQ,
    "lsc": VARIANT_LSC,
}


class SlicModel:
    """Owns Cluster[K]; marshals numpy <-> device; runs the compiled pipeline.

    Matches the reference constructor contract (cfast_slic.pyx:16-43):
    unsupported arch raises NotImplementedError, K outside (0, 65534)
    raises ValueError.
    """

    def __init__(self, num_components: int, arch_name: str = "standard",
                 real_dist: bool = False):
        self.backend = resolve_arch(arch_name)  # raises NotImplementedError
        if num_components >= MAX_NUM_COMPONENTS:
            raise ValueError("num_components cannot exceed 65534")
        if num_components <= 0:
            raise ValueError("num_components should be a non-negative integer")

        self.num_components = num_components
        self.num_threads = -1  # accepted for API parity; no-op on TPU
        self.arch_name = arch_name
        self.real_dist = real_dist
        self.real_dist_type = "standard"
        self.convert_to_lab = False
        self.float_color = True
        self.debug_mode = False
        # profile=True: per-iteration assign/update timer sections in
        # last_timing_report (reference fstimer schema, context.cpp:158-175)
        # without debug_mode's recorder snapshots (observability decoupled
        # from the slower debug execution path)
        self.profile = False
        self.preemptive = False
        self.preemptive_thres = 0.05
        self.manhattan_spatial_dist = True

        self._clusters = cluster_lib.zeros(num_components)
        self.initialized = False
        self.last_timing_report = ""
        self.last_recorder_report = ""

    # -- cluster state accessors (cfast_slic.pyx:45-121) --------------------

    def copy(self) -> "SlicModel":
        result = SlicModel(self.num_components)
        result._clusters = self._clusters.copy()
        result.initialized = self.initialized
        return result

    @property
    def clusters(self):
        return cluster_lib.clusters_to_dicts(self._clusters)

    @clusters.setter
    def clusters(self, dicts):
        self._clusters = cluster_lib.dicts_to_clusters(dicts)
        self.num_components = self._clusters.K
        self.initialized = True

    def to_yxmrgb(self):
        return cluster_lib.to_yxmrgb(self._clusters)

    # -- variant resolution --------------------------------------------------

    def _variant(self) -> str:
        if not self.real_dist:
            return VARIANT_STANDARD
        try:
            return _REAL_DIST_TO_VARIANT[self.real_dist_type]
        except KeyError:
            raise RuntimeError(
                "No such real_dist_type " + repr(self.real_dist_type)
            ) from None

    def _static_config(self, H: int, W: int) -> StaticConfig:
        return StaticConfig(
            H=H, W=W, K=self.num_components,
            variant=self._variant(),
            arch=self.backend,
            convert_to_lab=bool(self.convert_to_lab),
            manhattan_spatial_dist=bool(self.manhattan_spatial_dist),
            preemptive=bool(self.preemptive),
            float_color=bool(self.float_color),
            debug_mode=bool(self.debug_mode),
        )

    # -- pipeline entry points ----------------------------------------------

    def initialize(self, image) -> None:
        """Grid-seed the clusters from an image (cfast_slic.pyx:124-147)."""
        image = np.ascontiguousarray(image)
        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError("nchan != 3")
        self._clusters = cluster_lib.initialize_clusters(
            image, self.num_components)
        self.initialized = True

    def iterate(self, image, max_iter, compactness, min_size_factor,
                subsample_stride):
        """Run the full pipeline; returns int16 [H, W] labels with -1 for
        unassigned (cfast_slic.pyx:150-260)."""
        if not self.initialized:
            raise RuntimeError("Slic model is not initialized")
        image = np.ascontiguousarray(image, dtype=np.uint8)
        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError("nchan != 3")
        H, W = int(image.shape[0]), int(image.shape[1])
        cfg = self._static_config(H, W)

        from . import runner  # local import to keep model import light
        labels, final_clusters, report = runner.run_iterate(
            cfg, image, self._clusters,
            RuntimeParams(
                compactness=float(compactness),
                min_size_factor=float(min_size_factor),
                subsample_stride=int(subsample_stride),
                preemptive_thres=float(self.preemptive_thres),
                max_iter=int(max_iter),
            ),
            profile=bool(self.profile),
        )
        self._clusters = final_clusters
        self.last_timing_report = report.timing_json
        self.last_recorder_report = report.recorder_json
        return labels

    # -- graph / density utilities (cfast_slic.pyx:262-324) ------------------

    def get_connectivity(self, assignments):
        from .ops import graph
        nbr, lens = graph.adjacency_matrix(np.asarray(assignments),
                                           self.num_components)
        return graph.NodeConnectivity(matrix=nbr, lens=lens)

    def get_knn_connectivity(self, assignments, num_neighbors):
        from .ops import graph
        return graph.NodeConnectivity(
            graph.knn(self._clusters, int(num_neighbors),
                      np.asarray(assignments).shape))

    def get_mask_density(self, mask, assignments):
        from .ops import graph
        mask = np.asarray(mask)
        assignments = np.asarray(assignments)
        if mask.shape != assignments.shape:
            raise ValueError(
                "The shape of mask does not match the one of assignments")
        return graph.mask_density(
            mask, assignments, self._clusters)

    def broadcast_density_to_mask(self, densities, assignments):
        from .ops import graph
        densities = np.asarray(densities)
        if densities.shape[0] != self.num_components:
            raise ValueError(
                "The shape of densities should match the number of clusters")
        return graph.density_to_mask(
            densities, np.asarray(assignments), self.num_components)
