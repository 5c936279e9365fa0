"""Frame-grid ("stacked") batch mode: ONE batched program, per-frame math.

The third batching design, after ``lax.map`` (round 2) and the spacer-row
canvas (rounds 1-4), built to amortize the per-frame serial floors that map
mode replays B times (VERDICT r4: batching bought only +7% because lax.map
re-executes every per-frame dispatch floor sequentially) without the canvas'
coupling costs (global K, shifted coordinates, quantized-variants-only):

* Every pixel kernel gets a FRAME GRID AXIS: one ``pallas_call`` whose grid
  covers B stacked frames x strips, with per-frame candidate tables indexed
  by the frame coordinate (``assign_tpu`` ``frames=``; VMEM per strip is
  frame-height-independent, so the same strip kernel serves all B frames in
  one launch).  All row/cell math stays FRAME-LOCAL — no coordinate
  shifting, so every variant's semantics (incl. float centroid means) are
  bit-identical to the single-frame path by construction.
* Every [K]-sized glue op becomes ONE [B, K] op (clamp, visit keys,
  candidate build, apply_means, preemptive) — one dispatch amortized over
  the batch.  The candidate sort runs on a [B, 9K] batch axis (lax.sort
  sorts each row independently → per-frame results identical to the
  single-frame sort, one dispatch).
* update is ONE segment-sum over B*K bins (ids offset by b*K; the kernel's
  ``hmod`` keeps row coordinates frame-local), CCA is ONE frame-aware pass
  over the [B*H, W] stack (ops.cca.enforce_connectivity_canvas_flagged with
  pitch == frame_h — labels offset by b*K never merge across frames), and
  CCA's fixpoint propagation rounds serve the whole batch in each sweep.

Exactness contract: per-frame outputs are bit-identical to the single-frame
``Slic`` path (asserted by tests/test_stack.py); the same exactness flags
(candidate overflow, per-frame CCA tie/unassigned) drive the same host
escalations as map mode (parallel/batch.py).

Reference mapping: this is the TPU analog of the reference's multicore
amortization (OpenMP splits one frame across cores,
/root/reference/README.md:66-69); here the batch axis fills the chip and
fixed costs divide by B.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cluster import Clusters
from ..config import StaticConfig, UNASSIGNED, VARIANT_LSC, VARIANT_STANDARD
from ..pipeline import (DerivedScalars, _PREEMPTIVE_COOLDOWN, _clamp_centers,
                        _pad_planes_for_pallas, _subsample_stack,
                        cell_grid_shape, segment_sum_matmul,
                        update_apply_means_rows, visit_order_key)
from ..ops.cielab import rgb_to_lab_quantized


class StackOut(NamedTuple):
    labels: jnp.ndarray        # int32 [B, H, W], -1 = unassigned
    clusters: "Clusters"       # [B, K] fields
    cca_tie: jnp.ndarray       # bool [B] per-frame host-re-run flags
    cand_overflow: jnp.ndarray  # bool scalar
    raw_assignment: jnp.ndarray  # int32 [B, H, W] pre-CCA, frame-local ids


def build_candidates_batched(y, x, is_active, cfg: StaticConfig):
    """Frame-batched build_candidates (pipeline.build_candidates): y, x,
    is_active are [B, K] FRAME-LOCAL.  Returns (cand int32 [B, GH, GW, C]
    of frame-local cluster ids, overflow bool scalar).  Per-frame slices
    are bit-identical to the single-frame build (the two-key sort runs on
    the batch axis — each row sorts independently, and composite keys are
    unique per row, so the order is fully value-determined)."""
    GH, GW = cell_grid_shape(cfg)
    S, K = cfg.S, cfg.K
    C = cfg.cand_slots
    num_cells = GH * GW
    B = y.shape[0]

    ci = jnp.clip(y.astype(jnp.int32) // S, 0, GH - 1)    # [B, K]
    cj = jnp.clip(x.astype(jnp.int32) // S, 0, GW - 1)
    key = visit_order_key(y, x, cfg)                       # [B, K] (bcast)

    active = is_active != 0
    di9 = jnp.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.int32)[None, :, None]
    dj9 = jnp.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.int32)[None, :, None]
    ni = ci[:, None, :] + di9                              # [B, 9, K]
    nj = cj[:, None, :] + dj9
    ok = (active[:, None, :] & (ni >= 0) & (ni < GH)
          & (nj >= 0) & (nj < GW))
    cell9 = jnp.where(ok, ni * GW + nj, num_cells).reshape(B, 9 * K)
    key9 = jnp.broadcast_to(key[:, None, :], (B, 9, K)).reshape(B, 9 * K)

    # composite-key sort (see pipeline.build_candidates): one operand
    # through the sort network, per-row (per-frame) on the batch axis
    span = 4 * K
    if (num_cells + 1) * span < 2 ** 31:
        comp_key = jax.lax.sort(cell9 * span + key9, dimension=1)
        sc = comp_key // span
        okey = comp_key % span
    else:  # pragma: no cover - needs a ~10^5-cell grid
        sc, okey = jax.lax.sort((cell9, key9), num_keys=2)
    M = 9 * K
    iota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    run_start = jnp.concatenate(
        [jnp.ones([B, 1], bool), sc[:, 1:] != sc[:, :-1]], axis=1)
    rank = iota - jax.lax.cummax(jnp.where(run_start, iota, 0), axis=1)

    valid = sc < num_cells
    kept = valid & (rank < C)
    overflow = jnp.any(valid & (rank >= C))
    # one flat scatter with per-frame offsets (frame f owns slot block
    # [f*fstride, (f+1)*fstride); the +1 slot is each frame's dump target)
    fstride = num_cells * C + 1
    target = jnp.where(kept, sc * C + rank, num_cells * C)
    offs = (jnp.arange(B, dtype=jnp.int32) * fstride)[:, None]
    ckey = jnp.full([B * fstride], jnp.int32(2 ** 30)
                    ).at[(target + offs).reshape(-1)].set(okey.reshape(-1))
    ckey = ckey.reshape(B, fstride)[:, :num_cells * C].reshape(B, GH, GW, C)
    cand = jnp.where(ckey < 2 ** 30, ckey % K, -1)
    return cand, overflow


def run_assign_kernel_stacked(p3, old_p, st: Clusters, cand, cfg, coef,
                              rem, stride: int, B: int, fp3=None,
                              lsc_cent=None):
    """One assign pass over the stacked frames.  p3 int32 [3, B*Hp', Wp]
    (per-frame padded, full or subsampled-row layout), old_p [B*Hp', Wp],
    st fields [B, K], cand [B, GH, GW, C].  Returns assignment [B*Hp', Wp].
    """
    from ..pallas.assign_tpu import (assign_pallas_standard,
                                     assign_pallas_float,
                                     prepare_cell_fields_batched,
                                     prepare_feat_fields_batched)
    GH, GW = cell_grid_shape(cfg)
    table = jnp.stack([st.y, st.x, st.r, st.g, st.b], axis=-1)   # [B, K, 5]
    fields = prepare_cell_fields_batched(cand, table)
    interp = jax.default_backend() != "tpu"
    common = dict(S=cfg.S, GH=GH, GW=GW, C=cand.shape[-1], H=cfg.H, W=cfg.W,
                  manhattan=cfg.manhattan_spatial_dist, interpret=interp,
                  frames=B)
    rem_i = jnp.asarray(rem, jnp.int32)
    coef_f = jnp.asarray(coef, jnp.float32)
    if cfg.variant == VARIANT_STANDARD:
        a, _ = assign_pallas_standard(p3, old_p, fields, coef_f, rem_i,
                                      stride, **common)
        return a
    feat_fields = (prepare_feat_fields_batched(cand, lsc_cent)
                   if cfg.variant == VARIANT_LSC else None)
    a, _ = assign_pallas_float(p3, fp3, old_p, fields, feat_fields, coef_f,
                               rem_i, stride, variant=cfg.variant, **common)
    return a


def update_accumulate_stacked(p_sub, a_sub, cfg: StaticConfig, rem,
                              stride: int, mask_sub=None):
    """Batched update accumulation: p_sub int32 [3, B, Hs, W] (pad rows
    zero), a_sub int32 [B, Hs, W] with pad rows already UNASSIGNED.  Row r
    is frame-local absolute row r*stride + rem.  Returns
    (counts [B, K] i32, sums [5, B, K] i32) — ONE segment-sum over B*K bins
    (the reference's per-thread accumulators + critical merge,
    context.cpp:309-354, batched over frames)."""
    K, W = cfg.K, cfg.W
    B, Hs, _ = a_sub.shape
    mask = a_sub != UNASSIGNED
    if mask_sub is not None:
        mask = mask & mask_sub
    offs = (jnp.arange(B, dtype=jnp.int32) * K)[:, None, None]
    # masked/invalid pixels land in their frame's bin 0 with mask 0 (zero
    # values -> no contribution) so the segsum kernel's hi-bucket band
    # stays inside the frame
    ids_g = jnp.where(a_sub != UNASSIGNED, a_sub + offs, offs)
    if jax.default_backend() == "tpu":
        from ..pallas.segsum_tpu import slic_update_pallas
        acc6 = slic_update_pallas(
            ids_g.ravel(), mask.astype(jnp.int32).ravel(),
            p_sub[0].ravel(), p_sub[1].ravel(), p_sub[2].ravel(),
            jnp.asarray(rem, jnp.int32), B * K, W, stride, False, hmod=Hs)
        return (acc6[0, :B * K].reshape(B, K),
                acc6[1:6, :B * K].reshape(5, B, K))
    ii = (jax.lax.broadcasted_iota(jnp.int32, (B, Hs, W), 1) * stride + rem)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, Hs, W), 2)
    ids = jnp.where(mask, a_sub + offs, B * K).ravel()
    vals = jnp.stack(
        [mask.astype(jnp.int32), ii, jj,
         p_sub[0], p_sub[1], p_sub[2]], axis=-1).reshape(-1, 6)
    acc = segment_sum_matmul(ids, vals, B * K, max(cfg.H, W, 256))[:B * K]
    return (acc[:, 0].reshape(B, K),
            jnp.transpose(acc[:, 1:]).reshape(5, B, K))


def _preemptive_step_stacked(st: Clusters, old_y, old_x, cfg: StaticConfig,
                             l1_thres):
    """Batched PreemptiveGrid::set_new_clusters (preemptive.h:114-178;
    pipeline._preemptive_step with a leading batch axis).  st fields
    [B, K]; returns (st, pixel mask bool [B, H, W])."""
    S = cfg.S
    B, K = st.y.shape
    upd = st.is_updatable > 0
    moved = jnp.abs(old_x - st.x) + jnp.abs(old_y - st.y)
    new_updatable = jnp.where(
        upd,
        jnp.where(moved < l1_thres, st.is_updatable - 1, _PREEMPTIVE_COOLDOWN),
        st.is_updatable)
    upd2 = new_updatable > 0
    yi = jnp.trunc(st.y)
    xi = jnp.trunc(st.x)
    near = ((jnp.abs(yi[:, :, None] - yi[:, None, :]) <= 2 * S)
            & (jnp.abs(xi[:, :, None] - xi[:, None, :]) <= 2 * S))
    is_active = jnp.any(near & upd2[:, :, None], axis=1).astype(jnp.int32)
    all_active_f = jnp.all(is_active == 1, axis=1)              # [B]

    CH = -(-cfg.H // (2 * S))
    CW = -(-cfg.W // (2 * S))
    cy = jnp.clip(st.y.astype(jnp.int32) // (2 * S), 0, CH - 1)
    cx = jnp.clip(st.x.astype(jnp.int32) // (2 * S), 0, CW - 1)
    cell = (jnp.arange(B, dtype=jnp.int32)[:, None] * (CH * CW)
            + cy * CW + cx)
    grid = jnp.zeros([B * CH * CW], jnp.int32
                     ).at[cell.reshape(-1)].max(is_active.reshape(-1))
    grid = grid.reshape(B, CH, CW) > 0
    px = jnp.repeat(jnp.repeat(grid, 2 * S, 1)[:, : cfg.H], 2 * S, 2
                    )[:, :, : cfg.W]
    px = px | all_active_f[:, None, None]

    st = Clusters(
        y=st.y, x=st.x, r=st.r, g=st.g, b=st.b,
        num_members=st.num_members,
        is_active=is_active, is_updatable=new_updatable)
    return st, px


def stage_setup_stacked(images, st: Clusters, cfg: StaticConfig):
    """Batched cielab conversion + cluster color re-seed + preemptive init
    (context.cpp:114-157): images [B, H, W, 3] -> planes int32 [3, B, H, W]
    in ONE LAB kernel launch (LAB is per-pixel; the stacked layout just
    gives the kernel B times the strips)."""
    H, W, K = cfg.H, cfg.W, cfg.K
    B = images.shape[0]
    img_flat = images.reshape(B * H, W, 3)
    if cfg.convert_to_lab:
        if jax.default_backend() == "tpu":
            from ..pallas.lut_tpu import rgb_to_lab_planar
            planes = rgb_to_lab_planar(img_flat)
        else:
            planes = jnp.moveaxis(rgb_to_lab_quantized(img_flat), -1, 0)
    else:
        planes = jnp.moveaxis(img_flat.astype(jnp.int32), -1, 0)
    planes = planes.reshape(3, B, H, W)

    cyi = jnp.clip(st.y.astype(jnp.int32), 0, H - 1)      # [B, K]
    cxi = jnp.clip(st.x.astype(jnp.int32), 0, W - 1)
    offs = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
    seed = planes.reshape(3, -1)[:, offs + cyi * W + cxi]  # [3, B, K]
    st = Clusters(
        y=st.y, x=st.x,
        r=seed[0].astype(jnp.float32),
        g=seed[1].astype(jnp.float32),
        b=seed[2].astype(jnp.float32),
        num_members=st.num_members,
        is_active=st.is_active,
        is_updatable=jnp.full([B, K], _PREEMPTIVE_COOLDOWN, jnp.int32),
    )
    return planes, st


def _pad_frames(planes, cfg: StaticConfig, dtype=jnp.int32):
    """[3, B, H, W] -> [3, B*Hp, Wp] per-frame padded kernel stack."""
    _, B, H, W = planes.shape
    p = _pad_planes_for_pallas(planes.reshape(3 * B, H, W), cfg, dtype)
    Hp, Wp = p.shape[1], p.shape[2]
    return p.reshape(3, B, Hp, Wp).reshape(3, B * Hp, Wp)


def iterate_graph_stacked(images, st: Clusters, cfg: StaticConfig,
                          scalars: DerivedScalars, max_iter: int,
                          stride: int) -> StackOut:
    """The full batched iterate(): LAB -> max_iter x (assign, update) ->
    full assign -> frame-aware CCA, all with a leading frame axis.  cfg is
    the SINGLE-FRAME config (per-frame H/W/K/S); st fields are [B, K].

    Per-frame bit parity with pipeline.iterate_graph holds because every
    stage is the per-frame computation with a batch axis: the kernels'
    frame grid keeps all row/cell math frame-local, integer segment sums
    are order-insensitive, and the CCA path is the (tested) frame-aware
    canvas CCA with pitch == frame_h.
    """
    if cfg.variant == VARIANT_LSC:
        raise NotImplementedError(
            "stacked batch mode does not cover LSC yet (use map mode)")
    H, W, K = cfg.H, cfg.W, cfg.K
    B = images.shape[0]
    if (B * K) >= UNASSIGNED:
        raise ValueError("stacked batch needs B*K < 65535 (labels stay "
                         "u16-coded for CCA); got B=%d K=%d" % (B, K))
    coef = jnp.asarray(scalars.coef, jnp.float32)

    planes, st = stage_setup_stacked(images, st, cfg)
    p3_full = _pad_frames(planes, cfg)                   # [3, B*Hp, Wp]
    BHp, Wp = p3_full.shape[1], p3_full.shape[2]
    Hp = BHp // B

    Hs = -(-H // stride)
    pad = Hs * stride - H

    # per-rem loop-invariant slices (pipeline._stage_loop_subresident with
    # a frame axis): subsampled kernel stacks + unpadded value planes
    p3_subs, p_subs, valid_rows = [], [], []
    pv = jnp.concatenate(
        [planes, jnp.zeros((3, B, pad, W), planes.dtype)], axis=2
    ).reshape(3, B, Hs, stride, W)
    for rem in range(stride):
        sub, _ = _subsample_stack(
            p3_full.reshape(3 * B, Hp, Wp), Hp, H, stride, rem, 0)
        Hsp = sub.shape[1]
        p3_subs.append(sub.reshape(3, B * Hsp, Wp))
        p_subs.append(pv[:, :, :, rem])                  # [3, B, Hs, W]
        abs_r = np.arange(Hs) * stride + rem
        valid_rows.append(jnp.asarray((abs_r < H)[None, :, None]))
    Hsp = p3_subs[0].shape[1] // B

    a_subs = [jnp.full((B * Hsp, Wp), UNASSIGNED, jnp.int32)
              for _ in range(stride)]
    pixel_mask = jnp.ones([B, H, W], bool)
    cov_acc = jnp.bool_(False)

    for i in range(max_iter):
        rem = i % stride
        st = _clamp_centers(st, cfg)
        cand, cov = build_candidates_batched(st.y, st.x, st.is_active, cfg)
        cov_acc = cov_acc | cov
        a_new = run_assign_kernel_stacked(p3_subs[rem], a_subs[rem], st,
                                          cand, cfg, coef, rem, stride, B)
        a_subs[rem] = a_new
        old_y, old_x = st.y, st.x     # set_old_clusters (context.cpp:303)
        if jax.default_backend() == "tpu" and not cfg.preemptive:
            # padded-direct update (see pipeline._stage_loop_subresident):
            # consumes the assign kernel's padded output + padded planes,
            # frame offsets applied in-kernel (hmod)
            from ..pallas.segsum_tpu import slic_update_padded_pallas
            n_real = -(-(H - rem) // stride)
            acc6 = slic_update_padded_pallas(
                a_new, p3_subs[rem], jnp.asarray(rem, jnp.int32),
                jnp.asarray(K, jnp.int32), B * K, Wp, W, n_real, stride,
                False, hmod=Hsp)
            counts = acc6[0, :B * K].reshape(B, K)
            sums = acc6[1:6, :B * K].reshape(5, B, K)
        else:
            a3 = a_new.reshape(B, Hsp, Wp)[:, :Hs, :W]
            a_upd = jnp.where(valid_rows[rem], a3, UNASSIGNED)
            mask_sub = None
            if cfg.preemptive:
                pm = jnp.concatenate(
                    [pixel_mask, jnp.zeros((B, pad, W), bool)], axis=1
                ).reshape(B, Hs, stride, W)
                mask_sub = pm[:, :, rem]
            counts, sums = update_accumulate_stacked(
                p_subs[rem], a_upd, cfg, rem, stride, mask_sub)
        st = update_apply_means_rows(counts, sums, st, cfg)
        if cfg.preemptive:
            st, pixel_mask = _preemptive_step_stacked(
                st, old_y, old_x, cfg,
                jnp.asarray(scalars.l1_thres, jnp.float32))

    # interleave per-rem planes back to full resolution (once per frame)
    full = jnp.stack(
        [a_subs[r].reshape(B, Hsp, Wp)[:, :Hs, :W] for r in range(stride)],
        axis=2)                                          # [B, Hs, stride, W]
    assignment = full.reshape(B, Hs * stride, W)[:, :H]  # [B, H, W]

    # full_assign at stride 1 (context.cpp:176-181); preemptive finalize
    st = Clusters(
        y=st.y, x=st.x, r=st.r, g=st.g, b=st.b,
        num_members=st.num_members,
        is_active=jnp.ones([B, K], jnp.int32),
        is_updatable=st.is_updatable)
    st = _clamp_centers(st, cfg)
    cand, cov = build_candidates_batched(st.y, st.x, st.is_active, cfg)
    cov_acc = cov_acc | cov
    old_p = jnp.full((B, Hp, Wp), UNASSIGNED, jnp.int32
                     ).at[:, :H, :W].set(assignment).reshape(B * Hp, Wp)
    a_full = run_assign_kernel_stacked(p3_full, old_p, st, cand, cfg, coef,
                                       0, 1, B)
    assignment = a_full.reshape(B, Hp, Wp)[:, :H, :W]

    # frame-aware CCA over the [B*H, W] stack: labels offset by b*K never
    # merge across frames; pitch == frame_h (no spacer rows needed — the
    # stacked frames abut, unlike the window-leaking canvas)
    from ..ops.cca import enforce_connectivity_canvas_flagged
    offs = (jnp.arange(B, dtype=jnp.int32) * K)[:, None, None]
    a_glob = jnp.where(assignment != UNASSIGNED, assignment + offs,
                       UNASSIGNED).reshape(B * H, W)
    labels, tie = enforce_connectivity_canvas_flagged(
        a_glob, K, B, H, H, jnp.asarray(scalars.thres, jnp.int32),
        cfg.effective_max_components, cfg.S)
    labels = labels.reshape(B, H, W)
    labels = jnp.where(labels == UNASSIGNED, -1, labels)
    return StackOut(labels, st, tie, cov_acc, assignment)
