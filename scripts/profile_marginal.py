"""Marginal per-phase costs: time progressively larger subgraphs (all
pipelined) and report differences — removes per-dispatch tunnel overhead."""
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


def timeit(fn, *args, n=30, warmup=3):
    outs = [fn(*args) for _ in range(warmup)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    H, W, K = 720, 1280, 1600
    arch = "pallas"
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(90, 160, 3))
    image = np.kron(base, np.ones((8, 8, 1)))[:H, :W]
    image = np.clip(image + rng.integers(-10, 10, size=(H, W, 3)), 0, 255
                    ).astype(np.uint8)

    cfg = StaticConfig(H=H, W=W, K=K, arch=arch)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)
    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_pallas

    def upto(stage):
        def fn(image):
            planes = rgb_to_lab_pallas(image)
            if stage == "lab":
                return planes
            p3 = pipeline._pad_planes_for_pallas(planes, cfg)
            rems = jnp.array([i % 3 for i in range(10)], jnp.int32)

            def body(carry, rem):
                st_c, asg = carry
                st_c = pipeline._clamp_centers(st_c, cfg)
                cnd, _ = pipeline.build_candidates(
                    st_c.y, st_c.x, st_c.is_active, cfg)
                res = pipeline.assign_dispatch(
                    planes, p3, st_c, cnd, cfg, scal.coef, asg, rem, 3)
                st_c = pipeline.update_xla(
                    planes, res.assignment, st_c, cfg, rem, 3)
                return (st_c, res.assignment), None

            (st_c, asg), _ = jax.lax.scan(
                body, (st, jnp.full([H, W], UNASSIGNED, jnp.int32)), rems)
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
        return jax.jit(fn)

    prev = 0.0
    for stage in ("lab", "loop", "full_assign", "all"):
        t = timeit(upto(stage), img_dev, n=20)
        print(f"upto {stage:12s}: {t:8.2f} ms   (marginal {t-prev:+7.2f})")
        prev = t

    # ---- CCA sub-stages (marginal, from the full assignment)
    fa = upto("full_assign")
    assignment = jnp.asarray(np.asarray(fa(img_dev)))
    from fast_slic_tpu.ops import cca as cca_mod
    from fast_slic_tpu.pallas.cca_tpu import propagate_min_pallas
    maxc = cfg.effective_max_components
    n = H * W
    reach = cca_mod._slic_reach((H, W), cfg.S)

    def cca_upto(stage):
        def fn(assignment):
            L2 = cca_mod.connected_components(assignment)
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
            pid_hi = iota2 >> 16
            pid_mid = (iota2 >> 8) & 0xFF
            pid_lo = iota2 & 0xFF
            vals = jnp.stack(
                [il, jnp.where(is_leader, pid_hi, 0),
                 jnp.where(is_leader, pid_mid, 0),
                 jnp.where(is_leader, pid_lo, 0)], axis=-1).reshape(-1, 4)
            acc = pipeline.segment_sum_matmul(comp_flat, vals, maxc,
                                              max_val=max(n >> 16, 255))[:maxc]
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
            # final relabel propagation
            sub = jnp.where(kept_pre, jnp.cumsum(kept_pre.astype(jnp.int32)),
                            0)
            leader = jnp.clip(acc[:, 1] * 65536 + acc[:, 2] * 256 + acc[:, 3],
                              0, n - 1)
            seed_ids = jnp.where(jnp.arange(maxc) < 99999, leader, n)
            sub_seed = jnp.full([n + 1], cca_mod._BIG, jnp.int32
                                ).at[seed_ids].set(sub)[:n].reshape(H, W)
            m0 = jnp.where(is_leader, sub_seed, cca_mod._BIG)
            out = propagate_min_pallas(assignment, m0, reach=reach)
            return out
        return jax.jit(fn)

    prev = 0.0
    for stage in ("cc", "rank", "compprop", "segsum", "bsearch", "relabel"):
        t = timeit(cca_upto(stage), assignment, n=20)
        print(f"cca upto {stage:10s}: {t:8.2f} ms   (marginal {t-prev:+7.2f})")
        prev = t


if __name__ == "__main__":
    main()
