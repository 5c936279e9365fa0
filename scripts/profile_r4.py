"""Round-4 post-loop itemization: attribute the ~2.1 ms of post-loop time
that round 3 left un-itemized (VERDICT weak #3), with finer CCA sub-stages
(orphan resolution, tie flags, final output glue) and the true end-to-end
iterate_graph as the last prefix so nothing can hide between "cca done" and
"outputs returned".

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
    H = int(os.environ.get("FSTPU_PROF_H", "720"))
    W = int(os.environ.get("FSTPU_PROF_W", "1280"))
    K = int(os.environ.get("FSTPU_PROF_K", "1600"))
    arch = os.environ.get("FSTPU_PROF_ARCH", "pallas")
    cfg = StaticConfig(H=H, W=W, K=K, arch=arch)
    image = photo(H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)

    # ---- 0. true end-to-end: the exact program bench_single times
    def e2e(image, st_):
        out = pipeline.iterate_graph(image, st_, cfg, scal, 10, 3)
        return out.labels, out.clusters, out.cca_tie, out.cand_overflow
    t_e2e = timeit(e2e, img_dev, st)
    print(f"E2E iterate_graph: {t_e2e:8.2f} ms", flush=True)

    # ---- 1. prefix stages through the REAL stage functions
    def upto(stage):
        def fn(image, st_):
            planes, st_c, lsc_state = pipeline.stage_setup(image, st_, cfg,
                                                           scal)
            if stage == "setup":
                return planes, st_c.r
            st2, assignment, lsc_cent, cov, _ = pipeline.stage_loop(
                planes, st_c, lsc_state, cfg, scal, 10, 3)
            if stage == "loop":
                return assignment, st2.y
            st3, assignment, min_dists, cov2 = pipeline.stage_full_assign(
                planes, st2, lsc_state, lsc_cent, assignment, cfg, scal)
            if stage == "full_assign":
                return assignment, st3.y
            labels, tie = pipeline.stage_cca(assignment, cfg, scal)
            if stage == "cca":
                return labels
            return labels, st3, tie, cov | cov2
        return fn

    prev = 0.0
    for stage in ("setup", "loop", "full_assign", "cca", "outputs"):
        t = timeit(upto(stage), img_dev, st)
        print(f"upto {stage:12s}: {t:8.2f} ms   (marginal {t-prev:+7.2f})",
              flush=True)
        prev = t
    print(f"(E2E - prefix[outputs] = {t_e2e - prev:+.2f} ms — "
          "should be ~0; if not, iterate_graph does extra work)", flush=True)

    # ---- 2. CCA fine-grained sub-stages (real code path, inlined)
    fa = jax.jit(lambda im, s: upto("full_assign")(im, s)[0])
    assignment = jnp.asarray(np.asarray(fa(img_dev, st)))
    from fast_slic_tpu.ops import cca as cca_mod
    from fast_slic_tpu.pallas.cca_tpu import propagate_min_pallas
    from fast_slic_tpu.pallas.segsum_tpu import banded_lookup_pallas
    maxc = cfg.effective_max_components
    n = H * W
    reach = cca_mod._slic_reach((H, W), cfg.S)
    thres = jnp.asarray(scal.thres, jnp.int32)
    print(f"maxc={maxc} reach={reach} thres={int(np.asarray(thres))}",
          flush=True)

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
            num_components = row_offsets[-1] + row_counts[-1]
            overflow = num_components > maxc
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
            target = acc[:, 1] * 16384 + acc[:, 2]
            citoa = jnp.arange(maxc, dtype=jnp.int32)
            valid_comp = citoa < num_components
            kept_pre = valid_comp & (areas >= thres)
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
            lo, hi = jax.lax.fori_loop(
                0, steps, bs_body, (jnp.int32(0), jnp.int32(n)))
            T = lo
            if stage == "bsearch":
                return T
            n_gt = cnt_gt(T)
            fill = k - n_gt
            eq = kept_pre & (areas == T)
            eq_rank = jnp.cumsum(eq.astype(jnp.int32))
            kept = (kept_pre & (areas > T)) | (eq & (eq_rank <= fill))
            boundary_tie = (count_pre > k) & (fill < jnp.sum(
                eq.astype(jnp.int32)))
            substitute = jnp.where(
                kept, jnp.cumsum(kept.astype(jnp.int32)) - 1, UNASSIGNED
            ).astype(jnp.int32)
            substitute = substitute.at[0].set(
                jnp.where(kept[0], substitute[0], 0))
            substitute = jnp.where(valid_comp, substitute, 0)
            if stage == "keptsub":
                return substitute, boundary_tie
            target2 = jnp.where(citoa == 0, 0, target)
            substitute, unresolved = cca_mod._resolve_orphans(
                substitute, target2, maxc, False)
            if stage == "orphans":
                return substitute
            out = banded_lookup_pallas(comp_flat, substitute, maxc,
                                       False).reshape(H, W)
            if stage == "relabel":
                return out
            labels = jnp.where(out == UNASSIGNED, -1, out)
            return labels, boundary_tie | overflow | unresolved
        return fn

    prev = 0.0
    for stage in ("cc", "rank", "compprop", "segsum", "bsearch", "keptsub",
                  "orphans", "relabel", "flags"):
        t = timeit(cca_upto(stage), assignment)
        print(f"cca upto {stage:10s}: {t:8.2f} ms   (marginal {t-prev:+7.2f})",
              flush=True)
        prev = t

    # ---- 3. full-assign decomposition: the stride-1 pass alone vs its glue
    p3_host = None

    def fa_parts(part):
        def fn(image, st_):
            planes, st_c, _ = pipeline.stage_setup(image, st_, cfg, scal)
            p3 = pipeline._pad_planes_for_pallas(planes, cfg)
            asg = jnp.full([H, W], UNASSIGNED, jnp.int32)
            st_f = pipeline._clamp_centers(st_c, cfg)
            cand, cov = pipeline.build_candidates(st_f.y, st_f.x,
                                                  st_f.is_active, cfg)
            if part == "prep":
                return cand
            res = pipeline.assign_dispatch(planes, p3, st_f, cand, cfg,
                                           scal.coef, asg, 0, 1)
            return res.assignment
        return fn

    t_prep = timeit(fa_parts("prep"), img_dev, st)
    t_fa1 = timeit(fa_parts("assign"), img_dev, st)
    print(f"stride-1 assign pass alone: {t_fa1 - t_prep:6.2f} ms "
          f"(prep prefix {t_prep:6.2f})", flush=True)


if __name__ == "__main__":
    main()
