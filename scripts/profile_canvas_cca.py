"""Bisect enforce_connectivity_canvas_flagged cost on TPU."""
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
from fast_slic_tpu.parallel import canvas as canvas_lib
from fast_slic_tpu.ops import cca as cca_mod


def timeit(fn, *args, n=10, warmup=2):
    outs = [fn(*args) for _ in range(warmup)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def photo(H, W):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    return np.asarray(Image.fromarray(z["image"]).resize((W, H),
                                                         Image.BILINEAR))


def main():
    B, H, W, K = 4, 720, 1280, 1600
    cfg = canvas_lib.make_canvas_config(B, H, W, K, 3, arch="pallas")
    pitch, CH = cfg.canvas_pitch, cfg.H
    imgs = np.stack([photo(H, W) for _ in range(B)])
    cv = canvas_lib.build_canvas_images(imgs, pitch)
    states = [cl.initialize_clusters(img, K) for img in imgs]
    st_bk = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    st = canvas_lib.stack_cluster_state(st_bk, pitch)
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)

    # produce a realistic full assignment via the fused loop+full_assign
    def fa(image, st_):
        planes, st2, lsc = pipeline.stage_setup(image, st_, cfg, scal)
        st3, asg, lc, ovf, _ = pipeline.stage_loop(planes, st2, lsc, cfg,
                                                   scal, 10, 3)
        st4, asg2, md, _ = pipeline.stage_full_assign(planes, st3, lsc, lc,
                                                      asg, cfg, scal)
        return asg2
    assignment = jnp.asarray(np.asarray(jax.jit(fa)(jnp.asarray(cv), st)))

    maxc = cfg.effective_max_components
    n = CH * W
    S = cfg.S
    K_frame, pitch_, fh = cfg.frame_K, pitch, H
    print(f"maxc={maxc} n={n}")

    from fast_slic_tpu.pallas.cca_tpu import propagate_min_pallas

    def upto(stage):
        def fn(assignment):
            L2 = cca_mod.connected_components(assignment, S)
            if stage == "cc":
                return L2
            ii = jax.lax.broadcasted_iota(jnp.int32, (CH, W), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (CH, W), 1)
            iota2 = ii * W + jj
            is_leader = L2 == iota2
            il = is_leader.astype(jnp.int32)
            row_counts = jnp.sum(il, axis=1)
            row_offsets = jnp.cumsum(row_counts) - row_counts
            in_row = jnp.cumsum(il, axis=1) - il
            rank2 = row_offsets[:, None] + in_row
            num_components = row_offsets[-1] + row_counts[-1]
            comp_seed = jnp.where(is_leader, jnp.minimum(rank2, maxc - 1),
                                  cca_mod._BIG)
            comp2 = propagate_min_pallas(assignment, comp_seed,
                                         reach=cca_mod._slic_reach((CH, W), S))
            if stage == "compprop":
                return comp2
            comp_flat = comp2.reshape(-1)
            pid_hi = iota2 >> 16
            pid_mid = (iota2 >> 8) & 0xFF
            pid_lo = iota2 & 0xFF
            vals = jnp.stack(
                [jnp.ones_like(il), jnp.where(is_leader, pid_hi, 0),
                 jnp.where(is_leader, pid_mid, 0),
                 jnp.where(is_leader, pid_lo, 0)], axis=-1).reshape(-1, 4)
            acc = pipeline.segment_sum_matmul(
                comp_flat, vals, maxc, max_val=max(n >> 16, 255))[:maxc]
            if stage == "segsum":
                return acc
            areas = acc[:, 0]
            leader_of_comp = acc[:, 1] * 65536 + acc[:, 2] * 256 + acc[:, 3]
            citoa = jnp.arange(maxc, dtype=jnp.int32)
            valid_comp = citoa < num_components
            lrow = leader_of_comp // W
            cf = jnp.clip(lrow // pitch_, 0, B - 1)
            is_spacer = (lrow % pitch_) >= fh
            real = valid_comp & ~is_spacer
            kept_pre = real & (areas >= 9)

            def per_frame_sum(ind):
                return jnp.stack([
                    jnp.sum(jnp.where(cf == f, ind, 0)) for f in range(B)])

            def expand(vec_b):
                out = jnp.zeros([maxc], vec_b.dtype)
                for f in range(B):
                    out = jnp.where(cf == f, vec_b[f], out)
                return out

            if stage == "bookkeep1":
                return per_frame_sum(kept_pre.astype(jnp.int32))

            def cnt_gt(T_b):
                ind = kept_pre & (areas > expand(T_b))
                return per_frame_sum(ind.astype(jnp.int32))

            def bs_body(_, carry):
                lo, hi = carry
                mid = (lo + hi) // 2
                p = cnt_gt(mid) < K_frame
                return jnp.where(p, lo, mid + 1), jnp.where(p, mid, hi)

            steps = max(1, math.ceil(math.log2(max(n + 1, 2))))
            lo, hi = jax.lax.fori_loop(
                0, steps, bs_body,
                (jnp.zeros([B], jnp.int32), jnp.full([B], n, jnp.int32)))
            if stage == "bsearch":
                return lo
            # jump emulation: 3 iterations of [maxc] gathers
            sub = jnp.where(kept_pre, citoa, UNASSIGNED)
            t = jnp.minimum(citoa + 1, maxc - 1)
            for _ in range(3):
                sub = jnp.where(sub == UNASSIGNED, sub[t], sub)
                t = t[t]
            if stage == "jump3":
                return sub
            return sub
        return jax.jit(fn)

    prev = 0.0
    for stage in ("cc", "compprop", "segsum", "bookkeep1", "bsearch",
                  "jump3"):
        t = timeit(upto(stage), assignment, n=5)
        print(f"canvas cca upto {stage:10s}: {t:8.2f} ms  "
              f"(marginal {t-prev:+7.2f})")
        prev = t

    f = jax.jit(lambda a: cca_mod.enforce_connectivity_canvas_flagged(  # maxc arg is now PER-FRAME
        a, K_frame, B, pitch_, fh, jnp.int32(int(scal.thres)),
        maxc, S)[0])
    t = timeit(f, assignment, n=5)
    print(f"canvas cca FULL           : {t:8.2f} ms")


if __name__ == "__main__":
    main()
