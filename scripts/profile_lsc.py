"""LSC 1080p stage profiler (VERDICT round-2 item 10): where do cfg4's
~94 ms go?  Marginal prefix timings with the honest scalar-reduce sync."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fast_slic_tpu import cluster as cl
from fast_slic_tpu import pipeline
from fast_slic_tpu.config import StaticConfig, UNASSIGNED
from fast_slic_tpu.ops import lsc as lsc_ops


def timeit(fn, *args, n=20, warmup=2):
    f = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree.leaves(fn(*a))))
    for _ in range(warmup):
        r = f(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    H, W, K = 1080, 1920, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas", variant="lsc")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize((W + 512, H + 512),
                                                        Image.BILINEAR))
    image = np.ascontiguousarray(img[0:H, 128:128 + W])
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)

    def upto(stage):
        def fn(image, st_):
            planes, st2, lsc_state = pipeline.stage_setup(image, st_, cfg,
                                                          scal)
            if stage == "setup":   # lab + seed + feats + cent seed
                return lsc_state[0]
            st3, assignment, lsc_cent, cov, _ = pipeline.stage_loop(
                planes, st2, lsc_state, cfg, scal, 10, 3)
            if stage == "loop":
                return assignment
            st4, assignment, md, cov2 = pipeline.stage_full_assign(
                planes, st3, lsc_state, lsc_cent, assignment, cfg, scal)
            if stage == "full_assign":
                return assignment
            labels, tie = pipeline.stage_cca(assignment, cfg, scal)
            return labels
        return fn

    prev = 0.0
    for stage in ("setup", "loop", "full_assign", "all"):
        t = timeit(upto(stage), img_dev, st, n=10)
        print(f"upto {stage:12s}: {t:8.2f} ms  (marginal {t-prev:+8.2f})",
              flush=True)
        prev = t

    # loop internals: one iteration's pieces, chained x5 with feedback
    planes, st2, lsc_state = jax.jit(
        lambda i, s: pipeline.stage_setup(i, s, cfg, scal))(img_dev, st)
    lsc_feats, lsc_w, lsc_cent = lsc_state
    N = 5

    def chain_after(st_):
        asg = jnp.minimum(
            (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) // cfg.S)
            * (-(-W // cfg.S)) +
            jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) // cfg.S, K - 1)
        cent = lsc_cent
        for i in range(N):
            cent = lsc_ops.after_update(lsc_feats, lsc_w, st_, cent, cfg,
                                        i % 3, 3, asg + (i % 2))
        return cent

    t = timeit(chain_after, st2, n=10) / N
    print(f"after_update        : {t:8.2f} ms/iter", flush=True)

    def chain_assign(st_):
        p3 = pipeline._pad_planes_for_pallas(planes, cfg)
        fp3 = pipeline._pad_planes_for_pallas(lsc_feats, cfg, jnp.float32,
                                              planar=False)
        asg = jnp.full((p3.shape[1], p3.shape[2]), UNASSIGNED, jnp.int32)
        cand, _ = pipeline.build_candidates(st_.y, st_.x, st_.is_active,
                                            cfg)
        for i in range(N):
            a, d = pipeline.run_assign_kernel(
                p3, fp3, asg, st_, cand, cfg, scal.coef,
                jnp.int32(0), 1, lsc_cent + a[0, 0] * 1e-12 if i else
                lsc_cent)
            asg = a
        return asg

    t = timeit(chain_assign, st2, n=6) / N
    print(f"assign(full) kernel : {t:8.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
