"""Ablate the 10-iteration loop to find where its ~11 ms goes, and measure
the batched canvas to see which costs amortize."""
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
    outs = [fn(*args) for _ in range(warmup)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def photo(H, W, seed=0):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    return np.asarray(Image.fromarray(z["image"]).resize((W, H),
                                                         Image.BILINEAR))


def main():
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    image = photo(H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_pallas
    planes = jnp.asarray(np.asarray(jax.jit(rgb_to_lab_pallas)(
        jnp.asarray(image))))
    cand0 = jnp.asarray(np.asarray(jax.jit(
        lambda y, x, a: pipeline.build_candidates(y, x, a, cfg)[0])(
            st.y, st.x, st.is_active)))

    def loop(mode):
        def fn(planes, st_):
            p3 = pipeline._pad_planes_for_pallas(planes, cfg)
            rems = jnp.array([i % 3 for i in range(10)], jnp.int32)

            def body(carry, rem):
                st_c, asg = carry
                st_c = pipeline._clamp_centers(st_c, cfg)
                if mode in ("bc", "bc+assign", "full"):
                    cnd, _ = pipeline.build_candidates(
                        st_c.y, st_c.x, st_c.is_active, cfg)
                else:
                    cnd = cand0
                if mode in ("assign", "bc+assign", "full", "assign+update"):
                    res = pipeline.assign_dispatch(
                        planes, p3, st_c, cnd, cfg, scal.coef, asg, rem, 3)
                    asg = res.assignment
                if mode in ("full", "assign+update", "update"):
                    st_c = pipeline.update_xla(planes, asg, st_c, cfg,
                                               rem, 3)
                return (st_c, asg), None

            (st_c, asg), _ = jax.lax.scan(
                body, (st_, jnp.full([H, W], UNASSIGNED, jnp.int32)), rems)
            return asg, st_c.y
        return jax.jit(fn)

    for mode in ("bc", "assign", "update", "assign+update", "bc+assign",
                 "full"):
        t = timeit(loop(mode), planes, st)
        print(f"loop[{mode:13s}]: {t:8.2f} ms")

    # batched canvas e2e
    from fast_slic_tpu.parallel.batch import BatchedSlic
    for B in (4, 8):
        imgs = np.stack([photo(H, W) for _ in range(B)])
        bs = BatchedSlic(num_components=K, min_size_factor=0.1,
                         arch="pallas", check_exactness=True)
        t0 = time.perf_counter()
        out = bs.iterate(imgs, max_iter=10)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = bs.iterate(imgs, max_iter=10)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"canvas B={B}: {dt*1e3:8.2f} ms/batch = {dt/B*1e3:6.2f} "
              f"ms/frame ({B*H*W/dt/1e6:.1f} Mpix/s)  "
              f"[compile {compile_s:.0f}s]")


if __name__ == "__main__":
    main()
