"""Batched (video) SLIC over a device mesh.

``BatchedSlic`` runs the full iterate pipeline over a batch of frames with
ONE host dispatch per batch.  Three device-side batch modes:

* ``"map"`` (default): frames run sequentially on-device through the exact
  single-frame program via ``lax.map`` — zero dispatch between frames,
  every Pallas kernel at its full single-frame grid, bit-identical to the
  single-frame ``Slic`` path for every variant.  (A ``vmap`` over frames
  collapses Pallas throughput ~30x; sequential mapping does not.)
* ``"stack"``: ONE natively batched program — frame-grid Pallas kernels,
  [B, K] glue, one B*K-bin segment sum, one frame-aware CCA pass
  (parallel/stack.py), per-frame outputs bit-identical to map.  Built to
  amortize per-frame serial floors; measured SLOWER than map at 720p
  (round 5: 13.3 vs 10.35 ms/frame at B=32 — inside one XLA program the
  per-frame serial regions are latency/bandwidth-proportional, not fixed
  dispatch costs, so the batch axis buys nothing while B-coupled arrays
  lose band tightness; NOTES.md round 5).  Kept for workloads of many
  SMALL frames, where map mode's per-frame kernel grids degenerate.
* ``"canvas"``: frames stack into one tall canvas with spacer rows
  (parallel/canvas.py), processed as a single image.  Superseded by
  "stack" (no spacer waste, no coordinate shifting, all variants except
  LSC); kept for parity coverage.  Only available for the
  quantized-centroid variants (standard/real/real_l2 — float centroid
  means are not shift-invariant).

On a multi-device mesh the batch is split over the ``data`` axis with
``shard_map``; frames are independent, so the step needs no collectives
(the TPU-native analog of running one fast-slic process per core).

Exactness contract (matching the single-frame ``Slic``/runner path,
runner.py:48-82): candidate-capacity overflow re-runs the batch with larger
capacity; per-frame CCA boundary-tie / unassigned flags re-run that frame's
connectivity enforcement on the host for bit-parity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import cluster as cluster_lib
from ..cluster import Clusters
from ..config import (ARCH_PALLAS, ARCH_XLA, StaticConfig, UNASSIGNED,
                      VARIANT_LSC, VARIANT_REAL_NOQ, resolve_arch)
from ..pipeline import derive_scalars, iterate_graph
from . import canvas as canvas_lib
from .mesh import make_mesh


def _default_arch():
    return ARCH_PALLAS if jax.default_backend() == "tpu" else ARCH_XLA


@functools.lru_cache(maxsize=32)
def _compiled_canvas_step(cfg: StaticConfig, max_iter: int, stride: int,
                          mesh, B_local: int):
    """One canvas iterate step.  Takes per-frame state ([B, K] fields,
    frame-local y) and [B, H, W, 3] frames; returns per-frame labels,
    state, per-frame flags and the cropped raw assignment (for host CCA
    re-runs).  With a mesh, shard_mapped over the ``data`` axis."""
    B = cfg.canvas_frames if mesh is None else None
    pitch, fh = cfg.canvas_pitch, cfg.canvas_frame_h

    def local_step(images_l, st_l, scalars):
        # images_l: [B_l, H, W, 3]; st_l: Clusters with [B_l, K] fields
        B_l = images_l.shape[0]
        cv = jnp.zeros((B_l, pitch, images_l.shape[2], 3), images_l.dtype)
        cv = cv.at[:, :fh].set(images_l)
        cv = cv.reshape(B_l * pitch, images_l.shape[2], 3)
        st_canvas = canvas_lib.stack_cluster_state(st_l, pitch)
        out = iterate_graph(cv, st_canvas, cfg, scalars, max_iter, stride)
        labels = canvas_lib.crop_canvas_labels(out.labels, B_l, pitch, fh)
        raw = canvas_lib.crop_canvas_labels(out.raw_assignment, B_l, pitch,
                                            fh)
        # raw labels are global (f*K + k): make them frame-local for the
        # host CCA re-run path
        offs = (jnp.arange(B_l, dtype=jnp.int32) * cfg.frame_K)[:, None,
                                                                None]
        raw = jnp.where(raw == UNASSIGNED, UNASSIGNED, raw - offs)
        st_out = canvas_lib.unstack_cluster_state(out.clusters, B_l, pitch)
        flags = out.cca_tie                                  # [B_l]
        return labels, st_out, flags, out.cand_overflow, raw

    if mesh is None:
        def step(images, st, scalars):
            labels, st_out, flags, ovf, raw = local_step(images, st,
                                                         scalars)
            both = jnp.concatenate([ovf.reshape(1), flags.reshape(-1)])
            return labels, st_out, both, raw
        return jax.jit(step)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    D = mesh.shape["data"]

    def sharded(images, st, scalars):
        # images: [D*B_local, H, W, 3]; shard_map gives each device its
        # B_local frames; ovf is any-reduced across devices
        labels, st_out, flags, ovf, raw = local_step(images, st, scalars)
        ovf = jnp.any(jax.lax.all_gather(ovf, "data"))
        return labels, st_out, ovf.reshape(1), flags, raw

    specs_st = Clusters(*([P("data")] * 8))
    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(P("data"), specs_st, P()),
        out_specs=(P("data"), specs_st, P(), P("data"), P("data")),
        check_vma=False)

    def run(images, st, scalars):
        labels, st_out, ovf1, flags, raw = fn(images, st, scalars)
        return labels, st_out, jnp.concatenate([ovf1, flags]), raw

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _compiled_stack_step(cfg: StaticConfig, max_iter: int, stride: int,
                         mesh):
    """Frame-grid batched step (parallel/stack.py): ONE batched program —
    frame-axis Pallas grids, [B, K] glue, one B*K-bin segment sum, one
    frame-aware CCA pass — so per-frame serial floors amortize over B
    (lax.map replays them per frame).  Per-frame outputs are bit-identical
    to the single-frame pipeline (tests/test_stack.py)."""
    from .stack import iterate_graph_stacked

    def step(images, clusters, scalars):
        out = iterate_graph_stacked(images, clusters, cfg, scalars,
                                    max_iter, stride)
        both = jnp.concatenate([out.cand_overflow.reshape(1),
                                out.cca_tie.reshape(-1)])
        return out.labels, out.clusters, both, out.raw_assignment

    if mesh is None:
        return jax.jit(step)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def sharded(images, st, scalars):
        labels, st_out, both, raw = step(images, st, scalars)
        ovf = jnp.any(jax.lax.all_gather(both[0], "data"))
        return labels, st_out, ovf.reshape(1), both[1:], raw

    specs_st = Clusters(*([P("data")] * 8))
    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(P("data"), specs_st, P()),
        out_specs=(P("data"), specs_st, P(), P("data"), P("data")),
        check_vma=False)

    def run(images, st, scalars):
        labels, st_out, ovf1, tie, raw = fn(images, st, scalars)
        return labels, st_out, jnp.concatenate([ovf1, tie]), raw

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _compiled_map_step(cfg: StaticConfig, max_iter: int, stride: int,
                       mesh):
    """Per-frame lax.map step: frames run SEQUENTIALLY on-device through
    the exact single-frame pipeline — zero host dispatch between frames,
    every Pallas kernel at its full single-frame grid (a vmap collapses
    Pallas throughput ~30x; a canvas couples the frames' K and
    max_components and costs more per pixel than the single-frame program).
    Works for every variant (no canvas shift-variance), and each frame's
    output is bit-identical to the single-frame Slic path by construction.
    Sharded over the mesh's data axis when one is given (frames are
    independent; no collectives)."""
    def step(images, clusters, scalars):
        def one(args):
            image, st = args
            out = iterate_graph(image, st, cfg, scalars, max_iter, stride)
            return (out.labels, out.clusters, out.cca_tie,
                    out.cand_overflow, out.raw_assignment)

        labels, st, tie, ovf, raw = jax.lax.map(one, (images, clusters))
        # [1 + B] combined flag vector: ONE device->host fetch resolves
        # the whole batch's exactness state (each blocked fetch costs a
        # full dispatch round-trip)
        both = jnp.concatenate([jnp.any(ovf).reshape(1), tie.reshape(-1)])
        return labels, st, both, raw

    if mesh is None:
        return jax.jit(step)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def sharded(images, st, scalars):
        labels, st_out, both, raw = step(images, st, scalars)
        ovf = jnp.any(jax.lax.all_gather(both[0], "data"))
        return labels, st_out, ovf.reshape(1), both[1:], raw

    specs_st = Clusters(*([P("data")] * 8))
    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(P("data"), specs_st, P()),
        out_specs=(P("data"), specs_st, P(), P("data"), P("data")),
        check_vma=False)

    def run(images, st, scalars):
        labels, st_out, ovf1, tie, raw = fn(images, st, scalars)
        return labels, st_out, jnp.concatenate([ovf1, tie]), raw

    return jax.jit(run)


class BatchedSlic:
    """Video-batch SLIC: iterate() over [B, H, W, 3] frames.

    Cluster state is tracked per frame ([B, K] arrays), so each stream
    position warm-starts from its previous frame — the video pattern the
    reference achieves by reusing one Slic object per stream.  Labels are
    returned as a device int32 [B, H, W] array (-1 = unassigned) so a video
    loop can keep everything on-device; np.asarray() it to materialize.

    Exactness flags from the device pipeline are handled like the
    single-frame runner: candidate overflow re-runs the batch at higher
    capacity, per-frame CCA ties re-run that frame's connectivity
    enforcement on the host (set ``check_exactness=False`` to skip the
    host sync and accept the device CCA's deterministic tie rule).
    """

    def __init__(self, num_components=400, compactness=10.0,
                 min_size_factor=0.25, subsample_stride=3,
                 convert_to_lab=True, manhattan_spatial_dist=True,
                 variant="standard", preemptive=False, preemptive_thres=0.05,
                 arch=None, mesh=None, check_exactness=True,
                 batch_mode="map"):
        if batch_mode not in ("map", "canvas", "stack"):
            raise ValueError("batch_mode must be 'map', 'stack' or 'canvas'")
        self.batch_mode = batch_mode
        self.num_components = num_components
        self.compactness = compactness
        self.min_size_factor = min_size_factor
        self.subsample_stride = subsample_stride
        self.convert_to_lab = convert_to_lab
        self.manhattan_spatial_dist = manhattan_spatial_dist
        self.variant = variant
        self.preemptive = preemptive
        self.preemptive_thres = preemptive_thres
        self.arch = resolve_arch(arch) if arch is not None else None
        self.mesh = mesh
        self.check_exactness = check_exactness
        self._state = None  # per-frame Clusters ([B, K] fields)
        self._capacity_boost = 0

    # -- configuration -------------------------------------------------
    def _use_canvas(self):
        return (self.batch_mode == "canvas"
                and self.variant not in (VARIANT_REAL_NOQ, VARIANT_LSC))

    def _use_stack(self, B):
        # stacked mode covers everything but LSC; B*K must keep labels
        # u16-codable for the frame-aware CCA (falls back to map otherwise)
        return (self.batch_mode == "stack" and self.variant != VARIANT_LSC
                and (B // (1 if self.mesh is None
                           else self.mesh.shape["data"]))
                * self.num_components < 0xFFFF)

    def _cfg(self, B, H, W):
        arch = self.arch if self.arch is not None else _default_arch()
        kw = dict(
            arch=arch, variant=self.variant,
            convert_to_lab=self.convert_to_lab,
            manhattan_spatial_dist=self.manhattan_spatial_dist,
            preemptive=self.preemptive)
        if self._capacity_boost:
            # slots cap 48: see runner.py escalation (VMEM budget)
            kw["cand_slots"] = min(16 * (2 ** self._capacity_boost), 48)
        if self._use_canvas():
            B_local = B if self.mesh is None else B // self.mesh.shape["data"]
            return canvas_lib.make_canvas_config(
                B_local, H, W, self.num_components,
                int(self.subsample_stride), **kw)
        return StaticConfig(H=H, W=W, K=self.num_components, **kw)

    # -- state ----------------------------------------------------------
    def initialize(self, images):
        """Seed per-frame cluster states from the first batch (host-side
        grid seeding, once per stream)."""
        states = [cluster_lib.initialize_clusters(img, self.num_components)
                  for img in np.asarray(images)]
        self._state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    # -- hot path --------------------------------------------------------
    def iterate(self, images, max_iter=10):
        """images: uint8 [B, H, W, 3] — numpy or an already-on-device jax
        array (a video loop should stage frames on-device once and keep the
        whole loop device-resident; re-uploading per call costs host->device
        bandwidth)."""
        return self.iterate_async(images, max_iter).resolve()

    def iterate_async(self, images, max_iter=10):
        """Queue one batch and return a :class:`PendingBatch` WITHOUT any
        host synchronization.  A steady-state video loop should queue batch
        t+1 before resolving batch t, so the exactness-flag fetch (one
        device->host round-trip) overlaps the next batch's device compute:

            pending = slic.iterate_async(frames[0])
            for t in range(1, T):
                nxt = slic.iterate_async(frames[t])
                labels = pending.resolve()   # overlaps frames[t]'s compute
                ...
                pending = nxt
            labels = pending.resolve()

        The per-frame cluster state advances immediately (device-side);
        ``resolve()`` performs the flag check and any bit-parity host CCA
        re-runs for its batch, exactly like the synchronous ``iterate``.
        """
        if not isinstance(images, jax.Array):
            images = jnp.asarray(np.ascontiguousarray(images, np.uint8))
        if images.dtype != jnp.uint8:
            raise ValueError("images must be uint8")
        B, H, W, _ = images.shape
        if self.mesh is not None and B % self.mesh.shape["data"]:
            raise ValueError("batch size %d must divide over the data axis "
                             "(%d devices)" % (B, self.mesh.shape["data"]))
        if self._state is None:
            self.initialize(images)

        cfg = self._cfg(B, H, W)
        scalars = derive_scalars(cfg, self.compactness,
                                 self.min_size_factor,
                                 self.preemptive_thres)
        if self._use_canvas():
            B_local = B if self.mesh is None else B // self.mesh.shape["data"]
            fn = _compiled_canvas_step(cfg, int(max_iter),
                                       int(self.subsample_stride),
                                       self.mesh, B_local)
        elif self._use_stack(B):
            fn = _compiled_stack_step(cfg, int(max_iter),
                                      int(self.subsample_stride), self.mesh)
        else:
            fn = _compiled_map_step(cfg, int(max_iter),
                                    int(self.subsample_stride), self.mesh)

        prev_state = self._state
        labels, st, both, raw = fn(images, self._state, scalars)
        self.last_flags = both[1:]  # per-frame exactness flags (device)
        self._state = st
        return PendingBatch(self, images, prev_state, max_iter, cfg,
                            scalars, labels, both, raw)

    def _host_cca_rerun(self, labels, raw, flags_np, cfg, scalars):
        """Bit-parity escalation for flagged frames (CCA top-K area tie /
        unassigned pixels / component overflow — ops/cca.py docstring).

        Ladder per frame: (1) selection-only re-run — device recomputes
        components from the (device-resident) raw assignment, the host
        runs just the sequential heap selection, the device relabels —
        labels never leave the device; (2) full host CCA when the frame
        overflows the per-frame component cap."""
        from ..ops.cca import selection_rerun_device
        K = cfg.frame_K if cfg.is_canvas else cfg.K
        maxc = (cfg.frame_max_components if cfg.is_canvas
                else cfg.effective_max_components)
        raw_np = None
        for f in np.nonzero(flags_np)[0]:
            fixed_dev = selection_rerun_device(
                raw[int(f)], K, maxc, cfg.S, int(scalars.thres))
            if fixed_dev is not None:
                fixed_dev = jnp.where(fixed_dev == UNASSIGNED, -1,
                                      fixed_dev)
                labels = labels.at[int(f)].set(fixed_dev)
                continue
            from .. import native
            if raw_np is None:
                raw_np = np.asarray(raw)
            if native.available():
                fixed = native.enforce_connectivity_native(
                    raw_np[f], K, int(scalars.thres))
            else:  # pragma: no cover - g++ present in supported envs
                from ..ops.cca import enforce_connectivity_xla
                fixed = np.asarray(enforce_connectivity_xla(
                    jnp.asarray(raw_np[f].astype(np.int32)), K,
                    jnp.int32(int(scalars.thres))))
            out_f = fixed.astype(np.int32)
            out_f[fixed == UNASSIGNED] = -1
            labels = labels.at[int(f)].set(jnp.asarray(out_f))
        return labels


class PendingBatch:
    """A queued BatchedSlic batch: device arrays + the deferred exactness
    check.  See :meth:`BatchedSlic.iterate_async`."""

    def __init__(self, parent, images, prev_state, max_iter, cfg, scalars,
                 labels, both, raw):
        self._p = (parent, images, prev_state, max_iter, cfg, scalars,
                   labels, both, raw)

    def resolve(self):
        """Fetch this batch's exactness flags (one device->host transfer)
        and return the final labels, applying capacity escalation or
        bit-parity host CCA re-runs if flagged."""
        (parent, images, prev_state, max_iter, cfg, scalars, labels,
         both_d, raw) = self._p
        if not parent.check_exactness:
            return labels
        # ONE device->host transfer for all flags (already combined
        # in-graph): each blocked fetch costs a full dispatch round-trip
        # (28 ms through the dev tunnel)
        both = np.asarray(both_d)
        if bool(both[0]) and parent._capacity_boost < 2:
            # candidate capacity exceeded: recompile at 4x capacity and
            # re-run this batch from its pre-batch state (runner.py
            # escalation semantics)
            parent._capacity_boost += 1
            parent._state = prev_state
            return parent.iterate(images, max_iter)
        flags_np = both[1:]
        if flags_np.any():
            labels = parent._host_cca_rerun(labels, raw, flags_np, cfg,
                                            scalars)
        return labels

