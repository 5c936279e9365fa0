"""Explicit spatial parallelism: shard_map + ppermute halos + psum.

The GSPMD path (parallel/spatial.py) shards one image's rows with sharding
constraints and lets the compiler insert collectives.  This module is the
hand-written equivalent — the TPU-native analog of the reference's
row-parallel OpenMP decomposition with seam merging
(/root/reference/src/cca.cpp:89-99), per SURVEY.md §2.3:

* **assignment needs NO communication**: it is a gather (each shard holds
  the replicated [K] cluster state, shifts it into local row coordinates,
  and masks out clusters farther than S+1 rows from its slab — the same
  locality fact the candidate cells exploit);
* **update** reduces per-shard [K, 6] accumulators with ONE ``psum`` over
  the ``space`` axis — the all-reduce analog of the reference's
  critical-section merge (context.cpp:345-353);
* **connectivity enforcement** propagates per-shard to a local fixpoint and
  exchanges one-row halos with ``ppermute`` until a psum'd global fixpoint
  — the seam merge of cca.cpp:89-99, expressed as collectives that ride
  ICI (tests assert the compiled HLO contains collective-permute and no
  all-gather on pixel-sized arrays).

Exactness: bit-identical to the single-device pipeline (tests/
test_sharding.py) for the non-preemptive quantized variants.  Shifting
clusters by an integer row offset leaves every distance, window test and
truncation unchanged; visit-order keys are computed from global
coordinates; the subsample row mask uses rem' = (rem - row0) mod stride.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import cluster as cluster_lib
from ..cluster import Clusters
from ..config import (StaticConfig, UNASSIGNED, VARIANT_LSC,
                      VARIANT_REAL_NOQ)
from .. import pipeline
from ..ops import cca as cca_ops
from ..pallas.cca_tpu import propagate_min_pallas
from .mesh import make_mesh

_BIG = jnp.int32(0x7FFFFFFF)


def _perm(D, up):
    """ppermute pairs: up=True sends shard d -> d+1 (receive from above)."""
    if up:
        return [(i, i + 1) for i in range(D - 1)]
    return [(i + 1, i) for i in range(D - 1)]


def _halo_propagate(lab_l, m0_l, D, reach):
    """Min-propagation over equal-label regions across the whole sharded
    image: per-shard local fixpoint (the Pallas strip kernel) + one-row
    ppermute halo exchanges, iterated to a psum'd global fixpoint."""
    d = jax.lax.axis_index("space")
    # neighbor edge labels never change: exchange once
    lab_above = jax.lax.ppermute(lab_l[-1:], "space", _perm(D, True))
    lab_below = jax.lax.ppermute(lab_l[:1], "space", _perm(D, False))
    have_above = d > 0
    have_below = d < D - 1

    def body(carry):
        m, _ = carry
        m2 = propagate_min_pallas(lab_l, m, reach=reach)
        m_above = jax.lax.ppermute(m2[-1:], "space", _perm(D, True))
        m_below = jax.lax.ppermute(m2[:1], "space", _perm(D, False))
        top = jnp.where(
            have_above & (lab_above == lab_l[:1]),
            jnp.minimum(m2[:1], m_above), m2[:1])
        bot = jnp.where(
            have_below & (lab_below == lab_l[-1:]),
            jnp.minimum(m2[-1:], m_below), m2[-1:])
        m3 = jnp.concatenate([top, m2[1:-1], bot], axis=0)
        changed = jax.lax.psum(
            jnp.any(m3 != m).astype(jnp.int32), "space") > 0
        return m3, changed

    def cond(carry):
        return carry[1]

    m, _ = jax.lax.while_loop(cond, body, (m0_l, jnp.bool_(True)))
    return m


def _enforce_connectivity_spatial(assignment_l, K, min_threshold, maxc,
                                  S, Hl, W, D):
    """ConnectivityEnforcer::execute across row shards (cca.cpp:178-265).

    Same algorithm as ops.cca.enforce_connectivity_xla_flagged with every
    global quantity assembled by explicit collectives: leader ranks by an
    all-gathered prefix, areas/leaders by psum of local segment-sums,
    orphan targets by owner-computed psum, and all three propagations by
    :func:`_halo_propagate`.
    """
    from ..pipeline import segment_sum_matmul

    d = jax.lax.axis_index("space")
    row0 = d * Hl
    n_l = Hl * W
    n = D * n_l
    reach = cca_ops._slic_reach((Hl, W), S)

    iota_l = (jax.lax.broadcasted_iota(jnp.int32, (Hl, W), 0) * W
              + jax.lax.broadcasted_iota(jnp.int32, (Hl, W), 1)
              + row0 * W)                         # global pixel ids
    L2 = _halo_propagate(assignment_l, iota_l, D, reach)
    is_leader = L2 == iota_l
    il = is_leader.astype(jnp.int32)

    # global leader rank: local 2-D prefix + exclusive sum of lower shards
    row_counts = jnp.sum(il, axis=1)
    row_offsets = jnp.cumsum(row_counts) - row_counts
    in_row = jnp.cumsum(il, axis=1) - il
    local_total = row_offsets[-1] + row_counts[-1]
    totals = jax.lax.all_gather(local_total, "space")         # [D]
    shard_off = jnp.sum(jnp.where(jnp.arange(D) < d, totals, 0))
    rank2 = row_offsets[:, None] + in_row + shard_off
    num_components = jnp.sum(totals)
    overflow = num_components > maxc

    comp_seed = jnp.where(is_leader, jnp.minimum(rank2, maxc - 1), _BIG)
    comp2 = _halo_propagate(assignment_l, comp_seed, D, reach)
    comp_flat = comp2.reshape(-1)

    pid_hi = iota_l >> 16
    pid_mid = (iota_l >> 8) & 0xFF
    pid_lo = iota_l & 0xFF
    vals = jnp.stack(
        [jnp.ones_like(il), jnp.where(is_leader, pid_hi, 0),
         jnp.where(is_leader, pid_mid, 0),
         jnp.where(is_leader, pid_lo, 0)], axis=-1).reshape(-1, 4)
    acc = segment_sum_matmul(comp_flat, vals, maxc,
                             max_val=max(n >> 16, 255))[:maxc]
    acc = jax.lax.psum(acc, "space")          # the seam-safe global merge
    areas = acc[:, 0]
    leader_of_comp = acc[:, 1] * 65536 + acc[:, 2] * 256 + acc[:, 3]

    citoa = jnp.arange(maxc, dtype=jnp.int32)
    valid_comp = citoa < num_components
    kept_pre = valid_comp & (areas >= min_threshold)
    count_pre = jnp.sum(kept_pre.astype(jnp.int32))
    k = min(K, maxc)

    def cnt_gt(T):
        return jnp.sum((kept_pre & (areas > T)).astype(jnp.int32))

    def bs_body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        p = cnt_gt(mid) < k
        return jnp.where(p, lo, mid + 1), jnp.where(p, mid, hi)

    steps = max(1, math.ceil(math.log2(max(n + 1, 2))))
    lo, _ = jax.lax.fori_loop(0, steps, bs_body,
                              (jnp.int32(0), jnp.int32(n)))
    T = lo
    fill = k - cnt_gt(T)
    eq = kept_pre & (areas == T)
    eq_rank = jnp.cumsum(eq.astype(jnp.int32))
    kept = (kept_pre & (areas > T)) | (eq & (eq_rank <= fill))
    boundary_tie = (count_pre > k) & (fill < jnp.sum(eq.astype(jnp.int32)))

    substitute = jnp.where(
        kept, jnp.cumsum(kept.astype(jnp.int32)) - 1, UNASSIGNED
    ).astype(jnp.int32)
    substitute = substitute.at[0].set(jnp.where(kept[0], substitute[0], 0))

    # orphan adoption target: component of the leader's left/up neighbor —
    # computed by the shard OWNING that neighbor pixel, merged by psum
    leader = jnp.clip(leader_of_comp, 0, n - 1)
    has_left = (leader % W) > 0
    nb = jnp.where(has_left, leader - 1, jnp.maximum(leader - W, 0))
    owns = (nb >= row0 * W) & (nb < row0 * W + n_l) & valid_comp
    local_nb = jnp.clip(nb - row0 * W, 0, n_l - 1)
    target_l = jnp.where(owns, comp_flat[local_nb], 0)
    target = jax.lax.psum(target_l, "space")
    target = jnp.where(citoa == 0, 0, target)

    jump_steps = max(1, math.ceil(math.log2(max(maxc, 2))))

    def jump_cond(carry):
        sub, _, step = carry
        return (step < jump_steps) & jnp.any(sub == UNASSIGNED)

    def jump(carry):
        sub, t, step = carry
        sub = jnp.where(sub == UNASSIGNED, sub[t], sub)
        return sub, t[t], step + 1

    substitute, _, _ = jax.lax.while_loop(
        jump_cond, jump, (substitute, target, jnp.int32(0)))
    substitute = jnp.where(substitute == UNASSIGNED, 0, substitute)

    # relabel: seed each owned leader pixel with its substitute, propagate
    seed_ids = jnp.where(valid_comp & (leader >= row0 * W)
                         & (leader < row0 * W + n_l),
                         leader - row0 * W, n_l)
    sub_seed = jnp.full([n_l + 1], _BIG, jnp.int32
                        ).at[seed_ids].set(substitute)[:n_l].reshape(Hl, W)
    m0 = jnp.where(is_leader, sub_seed, _BIG)
    out = _halo_propagate(assignment_l, m0, D, reach)
    return out, boundary_tie | overflow


@functools.lru_cache(maxsize=16)
def _compiled_spatial_explicit(cfg: StaticConfig, max_iter: int,
                               stride: int, mesh, Hl: int):
    D = mesh.shape["space"]
    H, W, K, S = cfg.H, cfg.W, cfg.K, cfg.S
    cfg_local = __import__("dataclasses").replace(cfg, H=Hl, S_fixed=cfg.S)
    maxc = cfg.effective_max_components

    def local_step(img_l, st, scalars):
        d = jax.lax.axis_index("space")
        row0 = d * Hl
        coef = jnp.asarray(scalars.coef, jnp.float32)

        # cielab (local rows)
        if cfg.convert_to_lab:
            if jax.default_backend() == "tpu":
                from ..pallas.lut_tpu import rgb_to_lab_planar
                planes_l = rgb_to_lab_planar(img_l)
            else:
                from ..ops.cielab import rgb_to_lab_quantized
                planes_l = jnp.moveaxis(rgb_to_lab_quantized(img_l), -1, 0)
        else:
            planes_l = jnp.moveaxis(img_l.astype(jnp.int32), -1, 0)

        # cluster color re-seed: the owner shard of each center pixel
        # contributes, merged by psum (context.cpp:128-135)
        cyi = jnp.clip(st.y.astype(jnp.int32), 0, H - 1)
        cxi = jnp.clip(st.x.astype(jnp.int32), 0, W - 1)
        owns = (cyi >= row0) & (cyi < row0 + Hl)
        ly = jnp.clip(cyi - row0, 0, Hl - 1)
        cols = [jax.lax.psum(
            jnp.where(owns, planes_l[c, ly, cxi], 0), "space")
            for c in range(3)]
        st = Clusters(
            y=st.y, x=st.x,
            r=cols[0].astype(jnp.float32),
            g=cols[1].astype(jnp.float32),
            b=cols[2].astype(jnp.float32),
            num_members=st.num_members, is_active=st.is_active,
            is_updatable=jnp.full([K], pipeline._PREEMPTIVE_COOLDOWN,
                                  jnp.int32))

        # LSC feature space (sharded: psum'd image mean, halo'd centroid
        # seeding; ops/lsc.py features_sharded/seed_centroids_sharded)
        from ..ops import lsc as lsc_ops
        from ..config import VARIANT_LSC as _LSC
        lsc_feats_l = lsc_w_l = lsc_cent0 = fp3_l = None
        if cfg.variant == _LSC:
            lsc_feats_l, lsc_w_l = lsc_ops.features_sharded(
                planes_l, cfg, scalars.lsc_tables, row0, Hl, "space", D)
            lsc_cent0 = lsc_ops.seed_centroids_sharded(
                lsc_feats_l, st, cfg, row0, Hl, "space", D)
            if pipeline._use_pallas_any(cfg_local):
                fp3_l = pipeline._pad_planes_for_pallas(
                    lsc_feats_l, cfg_local, jnp.float32)

        p3_l = (pipeline._pad_planes_for_pallas(planes_l, cfg_local)
                if pipeline._use_pallas_any(cfg_local) else None)
        assignment = jnp.full([Hl, W], UNASSIGNED, jnp.int32)
        rems = jnp.array([i % stride for i in range(max_iter)], jnp.int32)
        ii_l = jax.lax.broadcasted_iota(jnp.int32, (Hl, W), 0)

        def one_assign(st_g, asg, rem, stride_i, lsc_cent):
            """One gather-assign over the local rows: clusters shifted into
            local coordinates; out-of-range clusters deactivated (their
            windows cannot reach this slab).  Returns the CLAMPED global
            state too (the single-device loop carries the clamped state,
            context.cpp:209-212)."""
            st_g = pipeline._clamp_centers(st_g, cfg)
            in_range = ((st_g.y >= row0 - S - 1)
                        & (st_g.y < row0 + Hl + S + 1))
            key = pipeline.visit_order_key(st_g.y, st_g.x, cfg)
            st_l = Clusters(
                y=st_g.y - row0, x=st_g.x, r=st_g.r, g=st_g.g, b=st_g.b,
                num_members=st_g.num_members,
                is_active=st_g.is_active * in_range.astype(jnp.int32),
                is_updatable=st_g.is_updatable)
            cand, cov = pipeline.build_candidates(
                st_l.y, st_l.x, st_l.is_active, cfg_local, key=key)
            rem_l = jnp.mod(rem - row0, stride_i)
            res = pipeline.assign_dispatch(
                planes_l, p3_l, st_l, cand, cfg_local, coef, asg, rem_l,
                stride_i, lsc_feats_l, lsc_cent, fp3_l)
            return res.assignment, res.min_dists, cov, st_g

        def loop_body(carry, rem):
            st_c, asg, cov_acc, pixel_mask, lsc_cent = carry
            asg, _, cov, st_c = one_assign(st_c, asg, rem, stride,
                                           lsc_cent)
            cov_acc = cov_acc | cov
            rem_l = jnp.mod(rem - row0, stride)
            old_y, old_x = st_c.y, st_c.x  # set_old_clusters
            pm_l = None
            if cfg.preemptive:
                # the preemptive mask is computed replicated at global
                # resolution ([K]-level nearness + cell expansion); each
                # shard slices its rows
                pm_l = jax.lax.dynamic_slice(pixel_mask, (row0, 0),
                                             (Hl, W))
            acc_l = pipeline.update_accumulate(planes_l, asg, cfg_local,
                                               rem_l, stride, pm_l)
            # local row sums -> global: sum_i(global) = sum_i(local) +
            # count * row0; then ONE psum merges the shards
            acc_l = acc_l.at[:, 1].add(acc_l[:, 0] * row0)
            acc = jax.lax.psum(acc_l, "space")
            st_c = pipeline.update_apply_means(acc, st_c, cfg)
            if cfg.variant == _LSC:
                row_ok = (ii_l % stride) == rem_l
                pm_s = row_ok if pm_l is None else (row_ok & pm_l)
                acc11 = lsc_ops.after_update_acc(
                    lsc_feats_l, lsc_w_l, asg, pm_s, K)
                acc11 = jax.lax.psum(acc11, "space")
                lsc_cent = lsc_ops.after_update_apply(acc11, st_c,
                                                      lsc_cent)
            if cfg.preemptive:
                st_c, pixel_mask = pipeline._preemptive_step(
                    st_c, old_y, old_x, cfg,
                    jnp.asarray(scalars.l1_thres, jnp.float32))
            return (st_c, asg, cov_acc, pixel_mask, lsc_cent), None

        pixel_mask0 = jnp.ones([H, W], bool)
        lsc_carry0 = (lsc_cent0 if lsc_cent0 is not None
                      else jnp.zeros([K, 10], jnp.float32))
        (st, assignment, cand_overflow, _, lsc_cent), _ = jax.lax.scan(
            loop_body,
            (st, assignment, jnp.bool_(False), pixel_mask0, lsc_carry0),
            rems)

        # preemptive_grid.finalize: everyone active again
        st = Clusters(y=st.y, x=st.x, r=st.r, g=st.g, b=st.b,
                      num_members=st.num_members,
                      is_active=jnp.ones([K], jnp.int32),
                      is_updatable=st.is_updatable)
        assignment, min_dists, cov, st = one_assign(st, assignment,
                                                    jnp.int32(0), 1,
                                                    lsc_cent)
        cand_overflow = cand_overflow | cov

        labels_l, tie = _enforce_connectivity_spatial(
            assignment, K, jnp.asarray(scalars.thres, jnp.int32), maxc,
            S, Hl, W, D)
        labels_l = jnp.where(labels_l == UNASSIGNED, -1, labels_l)
        return (labels_l, st, tie,
                jax.lax.psum(cand_overflow.astype(jnp.int32), "space") > 0,
                assignment)

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("space"), P(), P()),
        out_specs=(P("space"), P(), P(), P(), P("space")),
        check_vma=False)
    return jax.jit(fn)


class ShardedSlicExplicit:
    """Single-image SLIC with rows sharded over the ``space`` axis using
    hand-written collectives (ppermute halos + psum reductions).  Covers
    every variant (standard/real/real_l2/real_noq/lsc, the reference's
    row parallelism covers them uniformly, context-impl.cpp:15-24 +
    lsc-builder.cpp:49-64) and the preemptive grid.  Exact match with the
    single-device pipeline for the non-LSC variants; LSC agrees at
    tolerance level (the psum'd image-mean feature's f32 reduction order
    differs from the single-device mean).

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
        self.mesh = mesh if mesh is not None else make_mesh(space=None,
                                                            data=1)
        self._state = None

    def iterate(self, image, max_iter=10):
        image = np.ascontiguousarray(image, np.uint8)
        H, W, _ = image.shape
        D = self.mesh.shape["space"]
        if H % D:
            raise ValueError("image rows %d must divide over the space "
                             "axis (%d devices)" % (H, D))
        cfg = StaticConfig(H=H, W=W, K=self.num_components,
                           variant=self.variant, arch=self.arch,
                           convert_to_lab=self.convert_to_lab,
                           preemptive=self.preemptive)
        if self.variant == VARIANT_LSC and (cfg.S // 4) >= H // D:
            raise ValueError(
                "LSC centroid seeding window (S/4 = %d rows) must fit in "
                "one shard's slab (%d rows)" % (cfg.S // 4, H // D))
        if self._state is None:
            self._state = jax.tree.map(
                jnp.asarray,
                cluster_lib.initialize_clusters(image, self.num_components))
        fn = _compiled_spatial_explicit(cfg, int(max_iter),
                                        int(self.subsample_stride),
                                        self.mesh, H // D)
        scalars = pipeline.derive_scalars(
            cfg, self.compactness, self.min_size_factor,
            self.preemptive_thres)
        labels, st, tie, ovf, raw = fn(jnp.asarray(image), self._state,
                                       scalars)
        labels = np.asarray(labels).astype(np.int16)
        if bool(np.asarray(tie)) or bool(np.asarray(ovf)):
            # bit-parity escalation, single-frame runner semantics
            # (runner.py:70-95): host CCA re-run; without a compiler the
            # uncapped XLA re-run still yields valid labels
            from .. import native
            raw_np = np.asarray(raw)
            if native.available():
                fixed = native.enforce_connectivity_native(
                    raw_np, cfg.K, int(scalars.thres))
            else:  # pragma: no cover - g++ present in supported envs
                from ..ops.cca import enforce_connectivity_xla
                fixed = np.asarray(enforce_connectivity_xla(
                    jnp.asarray(raw_np.astype(np.int32)), cfg.K,
                    jnp.int32(int(scalars.thres))))
            labels = fixed.astype(np.int16)
            labels[fixed == UNASSIGNED] = -1
        self._state = st
        return labels
