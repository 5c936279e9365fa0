"""Per-phase device timing with pipelined dispatch (amortizes the axon
tunnel round-trip, which adds ~28 ms to any single block_until_ready)."""
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


def timeit(fn, *args, n=30, warmup=3):
    outs = [fn(*args) for _ in range(warmup)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


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

    fn = pipeline.compiled_iterate(cfg, 10, 3)
    t = timeit(lambda im: fn(im, st, scal).labels, img_dev, n=20)
    print(f"e2e 10-iter iterate       : {t:8.2f} ms  ({H*W/t/1e3:.1f} Mpix/s)")

    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_pallas
    labf = jax.jit(rgb_to_lab_pallas)
    t = timeit(labf, img_dev)
    print(f"LAB (pallas)              : {t:8.2f} ms")
    planes = jnp.asarray(np.asarray(labf(img_dev)))

    bc = jax.jit(lambda y, x, a: pipeline.build_candidates(y, x, a, cfg))
    t = timeit(bc, st.y, st.x, st.is_active)
    print(f"build_candidates          : {t:8.2f} ms")
    cand = jnp.asarray(np.asarray(bc(st.y, st.x, st.is_active)[0]))

    p3 = jnp.asarray(np.asarray(
        jax.jit(lambda p: pipeline._pad_planes_for_pallas(p, cfg))(planes)))
    old = jnp.full([H, W], UNASSIGNED, jnp.int32)
    for stride, rem, tag in ((3, 0, "assign stride3"),
                             (1, 0, "assign stride1")):
        f = jax.jit(lambda pl_, p3_, old_, _s=stride, _r=rem:
                    pipeline.assign_dispatch(
                        pl_, p3_, st, cand, cfg, scal.coef, old_, _r,
                        _s).assignment)
        t = timeit(f, planes, p3, old)
        print(f"{tag:26s}: {t:8.2f} ms")
        res = f(planes, p3, old)
    assignment = jnp.asarray(np.asarray(res))

    f = jax.jit(lambda pl_, a: pipeline.update_xla(pl_, a, st, cfg, 0, 3).y)
    t = timeit(f, planes, assignment)
    print(f"update (stride3)          : {t:8.2f} ms")

    from fast_slic_tpu.ops.cca import (enforce_connectivity_xla_flagged,
                                       connected_components)
    f = jax.jit(lambda a: enforce_connectivity_xla_flagged(
        a, K, jnp.int32(int(scal.thres)), cfg.effective_max_components,
        S=cfg.S)[0])
    t = timeit(f, assignment, n=20)
    print(f"enforce_connectivity      : {t:8.2f} ms")

    f = jax.jit(connected_components)
    t = timeit(f, assignment, n=20)
    print(f"  connected_components    : {t:8.2f} ms")


if __name__ == "__main__":
    main()
