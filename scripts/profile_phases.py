"""Per-phase timing of the single-frame pipeline on the real chip.

Splits the pipeline at phase boundaries into separate jits and times each
with block_until_ready, plus the fused end-to-end program for comparison.
"""
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


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    H, W, K = 720, 1280, 1600
    arch = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(90, 160, 3))
    image = np.kron(base, np.ones((8, 8, 1)))[:H, :W]
    image = np.clip(image + rng.integers(-10, 10, size=(H, W, 3)), 0, 255
                    ).astype(np.uint8)

    cfg = StaticConfig(H=H, W=W, K=K, arch=arch)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)

    # ---- end-to-end
    fn = pipeline.compiled_iterate(cfg, 10, 3)
    t_e2e, out = timeit(lambda im: fn(im, st, scal), img_dev, n=10)
    print(f"e2e 10-iter iterate       : {t_e2e:8.2f} ms   "
          f"({H*W/t_e2e/1e3:.1f} Mpix/s)  tie={bool(np.asarray(out.cca_tie))} "
          f"ovf={bool(np.asarray(out.cand_overflow))}")

    # ---- LAB
    if cfg.convert_to_lab:
        from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_pallas
        t, planes = timeit(jax.jit(rgb_to_lab_pallas), img_dev)
        print(f"LAB (pallas)              : {t:8.2f} ms")
    planes = jnp.asarray(np.asarray(planes))

    # ---- candidates
    bc = jax.jit(lambda y, x, a: pipeline.build_candidates(y, x, a, cfg))
    t, (cand, ovf) = timeit(bc, st.y, st.x, st.is_active)
    print(f"build_candidates          : {t:8.2f} ms")
    cand = jnp.asarray(np.asarray(cand))

    # ---- one assign pass (stride 3) and full (stride 1)
    p3 = jax.jit(lambda p: pipeline._pad_planes_for_pallas(p, cfg))(planes)
    old = jnp.full([H, W], UNASSIGNED, jnp.int32)
    for stride, rem, tag in ((3, 0, "assign stride3"), (1, 0, "assign stride1")):
        f = jax.jit(lambda pl_, p3_, old_: pipeline.assign_dispatch(
            pl_, p3_, st, cand, cfg, scal.coef, old_, rem, stride))
        t, res = timeit(f, planes, p3, old)
        print(f"{tag:26s}: {t:8.2f} ms")
    assignment = res.assignment

    # ---- one update
    f = jax.jit(lambda pl_, a: pipeline.update_xla(pl_, a, st, cfg, 0, 3))
    t, _ = timeit(f, planes, assignment)
    print(f"update (stride3)          : {t:8.2f} ms")

    # ---- CCA total + pieces
    from fast_slic_tpu.ops.cca import (enforce_connectivity_xla_flagged,
                                       connected_components)
    f = jax.jit(lambda a: enforce_connectivity_xla_flagged(
        a, K, jnp.int32(int(scal.thres)), cfg.effective_max_components,
        S=cfg.S))
    t, _ = timeit(f, assignment)
    print(f"enforce_connectivity      : {t:8.2f} ms")

    f = jax.jit(connected_components)
    t, L2 = timeit(f, assignment)
    print(f"  connected_components    : {t:8.2f} ms")

    # 10x (assign+update) scan without CCA/LAB to isolate scan glue
    def scan_only(planes_, st_):
        rems = jnp.array([i % 3 for i in range(10)], jnp.int32)
        p3_ = pipeline._pad_planes_for_pallas(planes_, cfg)

        def body(carry, rem):
            st_c, asg = carry
            st_c = pipeline._clamp_centers(st_c, cfg)
            cnd, _ = pipeline.build_candidates(st_c.y, st_c.x,
                                               st_c.is_active, cfg)
            res = pipeline.assign_dispatch(planes_, p3_, st_c, cnd, cfg,
                                           scal.coef, asg, rem, 3)
            st_c = pipeline.update_xla(planes_, res.assignment, st_c, cfg,
                                       rem, 3)
            return (st_c, res.assignment), None

        (st_c, asg), _ = jax.lax.scan(
            body, (st_, jnp.full([H, W], UNASSIGNED, jnp.int32)), rems)
        return asg

    f = jax.jit(scan_only)
    t, _ = timeit(f, planes, st, n=5)
    print(f"10x(assign+update) scan   : {t:8.2f} ms")


if __name__ == "__main__":
    main()
