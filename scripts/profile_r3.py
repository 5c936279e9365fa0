"""Round-3 stage profiler: marginal prefix timings with honest syncing.

Sync trap (NOTES.md): block_until_ready does not reliably wait on the
tunneled dev backend — every timing loop here syncs by an on-device reduce
to a scalar materialized with np.asarray.  Marginal (prefix-difference)
timings cancel the constant per-sync tunnel cost.
"""
import os
import sys
import time
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fast_slic_tpu import cluster as cl
from fast_slic_tpu import pipeline
from fast_slic_tpu.config import StaticConfig, UNASSIGNED


def _scalarize(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    acc = jnp.zeros((), jnp.float32)
    for x in leaves:
        acc = acc + jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32
                            else x)
    return acc


def timeit(fn, *args, n=40, warmup=3):
    f = jax.jit(lambda *a: _scalarize(fn(*a)))
    for _ in range(warmup):
        r = f(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / n * 1e3


def photo(H, W, seed=0):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize((W + 512, H + 512),
                                                        Image.BILINEAR))
    off = (16 * seed) % 512
    off2 = (80 * seed + 128) % 512
    return np.ascontiguousarray(img[off:off + H, off2:off2 + W])


def main():
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    image = photo(H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)
    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_planar

    def upto(stage):
        def fn(image, st_):
            planes = rgb_to_lab_planar(image)
            if stage == "lab":
                return planes
            p3 = pipeline._pad_planes_for_pallas(planes, cfg)
            if stage == "pad":
                return p3
            asg = jnp.full([H, W], UNASSIGNED, jnp.int32)
            st_c = st_
            for i in range(10):
                rem = i % 3
                st_c = pipeline._clamp_centers(st_c, cfg)
                cnd, _ = pipeline.build_candidates(
                    st_c.y, st_c.x, st_c.is_active, cfg)
                res = pipeline.assign_dispatch(
                    planes, p3, st_c, cnd, cfg, scal.coef, asg, rem, 3)
                asg = res.assignment
                st_c = pipeline.update_xla(planes, asg, st_c, cfg, rem, 3)
            if stage == "loop":
                return asg
            st_f = pipeline._clamp_centers(st_c, cfg)
            cnd, _ = pipeline.build_candidates(st_f.y, st_f.x,
                                               st_f.is_active, cfg)
            res = pipeline.assign_dispatch(planes, p3, st_f, cnd, cfg,
                                           scal.coef, asg, 0, 1)
            if stage == "full_assign":
                return res.assignment
            from fast_slic_tpu.ops.cca import (
                enforce_connectivity_xla_flagged)
            labels, tie = enforce_connectivity_xla_flagged(
                res.assignment, K, jnp.asarray(scal.thres, jnp.int32),
                cfg.effective_max_components, S=cfg.S)
            return labels
        return fn

    prev = 0.0
    for stage in ("lab", "pad", "loop", "full_assign", "all"):
        t = timeit(upto(stage), img_dev, st)
        print(f"upto {stage:12s}: {t:8.2f} ms   (marginal {t-prev:+7.2f})",
              flush=True)
        prev = t

    # ---- loop ablations (each with lab+pad prefix; subtract that)
    def loop_mode(mode):
        def fn(image, st_):
            planes = rgb_to_lab_planar(image)
            p3 = pipeline._pad_planes_for_pallas(planes, cfg)
            asg = jnp.full([H, W], UNASSIGNED, jnp.int32)
            st_c = st_
            cnd0, _ = pipeline.build_candidates(
                st_.y, st_.x, st_.is_active, cfg)
            for i in range(10):
                rem = i % 3
                st_c = pipeline._clamp_centers(st_c, cfg)
                if mode in ("bc", "bc+assign", "full"):
                    cnd, _ = pipeline.build_candidates(
                        st_c.y, st_c.x, st_c.is_active, cfg)
                else:
                    cnd = cnd0
                if mode in ("assign", "bc+assign", "full", "assign+update"):
                    res = pipeline.assign_dispatch(
                        planes, p3, st_c, cnd, cfg, scal.coef, asg, rem, 3)
                    asg = res.assignment
                if mode in ("full", "assign+update", "update"):
                    st_c = pipeline.update_xla(planes, asg, st_c, cfg,
                                               rem, 3)
            return asg, st_c.y
        return fn

    base = timeit(upto("pad"), img_dev, st)
    for mode in ("bc", "assign", "update", "assign+update", "bc+assign",
                 "full"):
        t = timeit(loop_mode(mode), img_dev, st)
        print(f"loop[{mode:13s}]: {t:8.2f} ms (-prefix {t-base:+7.2f})",
              flush=True)

    # ---- CCA sub-stages from the real full assignment
    fa = jax.jit(upto("full_assign"))
    assignment = jnp.asarray(np.asarray(fa(img_dev, st)))
    from fast_slic_tpu.ops import cca as cca_mod
    from fast_slic_tpu.pallas.cca_tpu import propagate_min_pallas
    maxc = cfg.effective_max_components
    n = H * W
    reach = cca_mod._slic_reach((H, W), cfg.S)
    print(f"maxc={maxc} reach={reach}", flush=True)

    # candidate stats (for the single-propagation redesign)
    def cand_stats(a):
        up = cca_mod._shifted(a, -1, 0, -2)
        left = cca_mod._shifted(a, 0, -1, -2)
        is_cand = (a != up) & (a != left)
        return jnp.sum(is_cand.astype(jnp.int32))
    ncand = int(np.asarray(jax.jit(cand_stats)(assignment)))
    L2_ = jax.jit(lambda a: cca_mod.connected_components(a, cfg.S))(assignment)
    ii = np.arange(H)[:, None] * W + np.arange(W)[None, :]
    ncomp = int((np.asarray(L2_) == ii).sum())
    print(f"components={ncomp} leader-candidates={ncand} "
          f"(ratio {ncand/ncomp:.2f})", flush=True)

    def cca_upto(stage):
        def fn(assignment):
            L2 = cca_mod.connected_components(assignment, cfg.S)
            if stage == "cc":
                return L2
            ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            iota2 = ii * W + jj
            is_leader = L2 == iota2
            il = is_leader.astype(jnp.int32)
            row_counts = jnp.sum(il, axis=1)
            row_offsets = jnp.cumsum(row_counts) - row_counts
            in_row = jnp.cumsum(il, axis=1) - il
            rank2 = row_offsets[:, None] + in_row
            if stage == "rank":
                return rank2
            comp_seed = jnp.where(is_leader, jnp.minimum(rank2, maxc - 1),
                                  cca_mod._BIG)
            comp2 = propagate_min_pallas(assignment, comp_seed, reach=reach)
            if stage == "compprop":
                return comp2
            comp_flat = comp2.reshape(-1)
            donor_comp = jnp.where(jj > 0, cca_mod._shifted(comp2, 0, -1, 0),
                                   cca_mod._shifted(comp2, -1, 0, 0))
            vals = jnp.stack(
                [jnp.ones_like(il),
                 jnp.where(is_leader, donor_comp >> 14, 0),
                 jnp.where(is_leader, donor_comp & 16383, 0)],
                axis=-1).reshape(-1, 3)
            acc = pipeline.segment_sum_matmul(comp_flat, vals, maxc,
                                              max_val=max(n >> 16, 16383)
                                              )[:maxc]
            if stage == "segsum":
                return acc
            areas = acc[:, 0]
            kept_pre = (jnp.arange(maxc) < 99999) & (areas >= 9)

            def cnt_gt(T):
                return jnp.sum((kept_pre & (areas > T)).astype(jnp.int32))

            def bs_body(_, carry):
                lo, hi = carry
                mid = (lo + hi) // 2
                p = cnt_gt(mid) < 1600
                return jnp.where(p, lo, mid + 1), jnp.where(p, mid, hi)

            steps = max(1, math.ceil(math.log2(max(n + 1, 2))))
            lo, hi = jax.lax.fori_loop(
                0, steps, bs_body, (jnp.int32(0), jnp.int32(n)))
            if stage == "bsearch":
                return lo
            sub = jnp.where(kept_pre, jnp.cumsum(kept_pre.astype(jnp.int32)),
                            0)
            from fast_slic_tpu.pallas.segsum_tpu import banded_lookup_pallas
            out = banded_lookup_pallas(comp_flat, sub, maxc, False)
            return out
        return fn

    prev = 0.0
    for stage in ("cc", "rank", "compprop", "segsum", "bsearch", "relabel"):
        t = timeit(cca_upto(stage), assignment)
        print(f"cca upto {stage:10s}: {t:8.2f} ms   (marginal {t-prev:+7.2f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
