"""LSC 1080p stage_loop anatomy: the real stage_loop costs ~56 ms while
10x the measured iteration body costs ~27 — this sweep separates the loop's
fixed prep (fp3 pad + per-rem subsample of the 83 MB feature stack) from
the per-iteration cost, and tests whether feeding stage_setup's outputs as
program INPUTS (materialized, fixed layout) changes the picture vs the
composed program (where XLA may lay out / rematerialize the [H, W, 10]
feats differently).

Sync: on-device scalar reduce (NOTES.md traps).
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
from fast_slic_tpu.config import StaticConfig


def timeit(fn, *args, n=10, warmup=2):
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


def photo(H, W, seed=0):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize((W + 512, H + 512),
                                                        Image.BILINEAR))
    return np.ascontiguousarray(img[0:H, 128:128 + W])


def main():
    H, W, K = 1080, 1920, 1600
    stride = 3
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas", variant="lsc")
    image = photo(H, W)
    st0 = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)

    # DCE caveat (ADVICE r4): at small mi, XLA dead-code-eliminates the
    # per-rem subsample prep for remainders never used (mi=0 kills all three
    # rem slices), so successive deltas below mi=3 mix incremental prep with
    # per-iteration cost.  Derive the per-iter slope ONLY from the region
    # where all three rem slices are live (the 4->7->10 deltas), and read
    # fixed prep as the mi=4 point minus 4x that slope.

    # A. composed (setup in-graph), loop iterations swept
    def upto_loop(mi):
        def fn(image, st_):
            planes, st2, lsc_state = pipeline.stage_setup(image, st_, cfg,
                                                          scal)
            st3, assignment, lsc_cent, cov, _ = pipeline.stage_loop(
                planes, st2, lsc_state, cfg, scal, mi, stride)
            return st3.y, assignment[::97, ::97], cov
        return fn

    prev = prev_mi = None
    for mi in (0, 1, 2, 4, 7, 10):
        t = timeit(upto_loop(mi), img_dev, st0, n=8)
        d = ("" if prev is None else
             f"  (+{(t - prev):6.2f} for +{mi - prev_mi} iters)")
        print(f"composed setup+loop[{mi:2d}]: {t:8.2f} ms{d}", flush=True)
        prev, prev_mi = t, mi

    # B. materialized inputs (stage_setup outputs staged on device)
    planes, st2, lsc_state = jax.jit(
        lambda i, s: pipeline.stage_setup(i, s, cfg, scal))(img_dev, st0)
    mats = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                        [planes, st2, list(lsc_state)])
    planes, st2, lsc_state = mats[0], mats[1], tuple(mats[2])

    def loop_only(mi):
        def fn(planes, st_, feats, w, cent):
            st3, assignment, lsc_cent, cov, _ = pipeline.stage_loop(
                planes, st_, (feats, w, cent), cfg, scal, mi, stride)
            return st3.y, assignment[::97, ::97], cov
        return fn

    prev = prev_mi = None
    for mi in (0, 1, 2, 4, 7, 10):
        t = timeit(loop_only(mi), planes, st2, *lsc_state, n=8)
        d = ("" if prev is None else
             f"  (+{(t - prev):6.2f} for +{mi - prev_mi} iters)")
        print(f"materialized loop[{mi:2d}] : {t:8.2f} ms{d}", flush=True)
        prev, prev_mi = t, mi


if __name__ == "__main__":
    main()
