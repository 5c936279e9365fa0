"""Host-side execution of the compiled pipeline (the "binding layer").

Plays the role of the reference's Cython glue (cfast_slic.pyx:150-260):
marshals numpy in/out, invokes the jitted program, converts the label map
to int16 with -1 for unassigned, and attaches timing / recorder reports.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np

from . import pipeline
from .cluster import Clusters
from .config import RuntimeParams, StaticConfig, UNASSIGNED
from .utils.timing import Timer
from .utils import recorder as recorder_lib


class Report(NamedTuple):
    timing_json: str
    recorder_json: str


def run_iterate(cfg: StaticConfig, image: np.ndarray, clusters: Clusters,
                params: RuntimeParams, _escalation: int = 0,
                profile: bool = False):
    """Execute iterate(); returns (labels int16 np [H,W], Clusters, Report).

    If the pipeline flags candidate-capacity overflow (clusters crowding a
    3x3 cell neighborhood beyond cand_slots — possible only with extreme
    centroid drift), re-runs with the VMEM-cap slot count (48).

    ``profile=True`` (slic_model.profile) runs the per-iteration
    phase-split program: the timing report carries one ``assign`` /
    ``update`` (/ ``after_update``) section per iteration like the
    reference's fstimer output (src/context.cpp:158-175) — decoupled from
    debug_mode, no recorder snapshots.
    """
    timer = Timer()
    recorder_json = ""
    with timer.scope("iterate"):
        scalars = pipeline.derive_scalars(
            cfg, params.compactness, params.min_size_factor,
            params.preemptive_thres)
        if profile and not cfg.debug_mode:
            with timer.scope("execute"):
                out = pipeline.run_iterate_profiled(
                    cfg, image, jax.tree.map(jax.numpy.asarray, clusters),
                    scalars, params.max_iter, params.subsample_stride,
                    timer)
        elif cfg.debug_mode:
            # phase-split execution: real per-phase device durations under
            # the reference's timing schema (src/context.cpp:112-194), at
            # the cost of a host sync per phase
            with timer.scope("execute"):
                out = pipeline.run_iterate_phased(
                    cfg, image, jax.tree.map(jax.numpy.asarray, clusters),
                    scalars, params.max_iter, params.subsample_stride,
                    timer)
        else:
            with timer.scope("compile"):
                fn = pipeline.compiled_iterate(
                    cfg, params.max_iter, params.subsample_stride)
            with timer.scope("execute"):
                out = fn(image, jax.tree.map(jax.numpy.asarray, clusters),
                         scalars)
                out = jax.block_until_ready(out)
        if bool(np.asarray(out.cand_overflow)) and _escalation < 2:
            import dataclasses
            # slots cap 48: the assign kernel's row-expanded fields are
            # [64, cand_slots*GW] f32 x ~11 in VMEM — 120 slots would blow
            # the 16 MB budget (measured 23 MB at 120)
            bigger = dataclasses.replace(
                cfg,
                cand_slots=min(cfg.cand_slots * 3, 48),
            )
            return run_iterate(bigger, image, clusters, params,
                               _escalation + 1, profile=profile)
        with timer.scope("write_back"):
            st_dev, snaps = out.clusters, out.snaps
            labels = np.asarray(out.labels).astype(np.int16)
            if bool(np.asarray(out.cca_tie)):
                # Rare: component areas tie exactly at the top-K boundary,
                # where the device CCA's deterministic rule can differ from
                # the reference's std::partial_sort (whose tie behavior has
                # no closed form — NOTES.md round 5).  Exact escalation
                # ladder: (1) selection-only re-run — the device recomputes
                # components/areas, the host runs just the sequential heap
                # selection on [maxc] arrays, the device relabels
                # (ops.cca.selection_rerun_device); (2) full host CCA on
                # per-frame component overflow.
                with timer.scope("enforce_connectivity_host"):
                    from .ops.cca import selection_rerun_device
                    fixed_dev = selection_rerun_device(
                        out.raw_assignment, cfg.K,
                        cfg.effective_max_components, cfg.S,
                        int(scalars.thres))
                    if fixed_dev is not None:
                        fixed = np.asarray(fixed_dev)
                    else:
                        from . import native
                        raw = np.asarray(out.raw_assignment)
                        if native.available():
                            fixed = native.enforce_connectivity_native(
                                raw, cfg.K, int(scalars.thres))
                        else:  # pragma: no cover - g++ in supported envs
                            # uncapped re-run (maxc = n: no overflow, and
                            # the gather paths are fine on host) so the
                            # labels are at least valid; only boundary-tie
                            # ORDER can then differ from the reference
                            from .ops.cca import enforce_connectivity_xla
                            import jax.numpy as jnp
                            fixed = np.asarray(enforce_connectivity_xla(
                                jnp.asarray(raw.astype(np.int32)), cfg.K,
                                jnp.int32(int(scalars.thres))))
                    labels = fixed.astype(np.int16)
                    labels[fixed == UNASSIGNED] = -1
            final = Clusters(*(np.asarray(f) for f in (
                st_dev.y, st_dev.x, st_dev.r, st_dev.g, st_dev.b,
                st_dev.num_members, st_dev.is_active, st_dev.is_updatable)))
        if cfg.debug_mode and snaps is not None:
            with timer.scope("recorder"):
                iters, s_assign, s_dists, s_clusters = snaps
                clusters_seq = [
                    Clusters(*(np.asarray(f)[t] for f in (
                        s_clusters.y, s_clusters.x, s_clusters.r,
                        s_clusters.g, s_clusters.b, s_clusters.num_members,
                        s_clusters.is_active, s_clusters.is_updatable)))
                    for t in range(len(iters))
                ]
                recorder_json = recorder_lib.render_report(
                    cfg.H, cfg.W, list(iters),
                    np.asarray(s_assign), np.asarray(s_dists), clusters_seq)
    return labels, final, Report(timer.report(), recorder_json)
