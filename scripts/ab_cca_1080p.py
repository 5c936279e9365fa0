"""CCA strip/store A/B at 1080p (VERDICT r3 #3/#8): the round-3 strip-96
default OOM'd Mosaic's scoped VMEM at Wp=1920 (measured 20.43 MB > 16 MB)
— this verifies which (strip, mask-store) variants compile on real TPU,
that their outputs are identical, and which is fastest, on a real
1080p-shaped SLIC fragment map (full pipeline assignment, pre-CCA).
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from fast_slic_tpu import cluster as cl
from fast_slic_tpu import pipeline
from fast_slic_tpu.config import StaticConfig
from fast_slic_tpu.pallas.cca_tpu import (propagate_min_pallas,
                                          connected_components_pallas,
                                          _vmem_estimate)


def timeit(fn, *args, n=30, warmup=2):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
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
    S = StaticConfig(H=H, W=W, K=K).S
    reach = 2 * S + 4
    print(f"S={S} reach={reach}", flush=True)
    h = bench.wait_healthy("ab_cca")
    print("health:", h, flush=True)

    # real pre-CCA assignment from the full pipeline at 1080p
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    image = bench.make_image(H, W, seed=3)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)

    def pre_cca(image, st_):
        planes, st2, lsc_state = pipeline.stage_setup(image, st_, cfg, scal)
        st3, assignment, lsc_cent, cov, _ = pipeline.stage_loop(
            planes, st2, lsc_state, cfg, scal, 10, 3)
        st4, assignment, md, cov2 = pipeline.stage_full_assign(
            planes, st3, lsc_state, lsc_cent, assignment, cfg, scal)
        return assignment
    assignment = jnp.asarray(np.asarray(jax.jit(pre_cca)(
        jnp.asarray(image), st)))
    print("assignment ready", flush=True)

    ref_out = None
    variants = [(64, "i32"), (96, "packed"), (128, "packed"),
                (160, "packed"), (64, "packed")]
    for strip, store in variants:
        est = _vmem_estimate(strip, 1920, reach, store)
        tag = f"strip={strip:3d} store={store:4s} est={est/2**20:5.1f}MB"
        try:
            t = timeit(lambda a: connected_components_pallas(
                a, strip=strip, reach=reach, store=store), assignment)
            out = np.asarray(jax.jit(lambda a: connected_components_pallas(
                a, strip=strip, reach=reach, store=store))(assignment))
            if ref_out is None:
                ref_out = out
                ident = "REF"
            else:
                ident = "identical" if np.array_equal(out, ref_out) \
                    else "MISMATCH!"
            print(f"{tag}: {t:6.2f} ms  [{ident}]", flush=True)
        except Exception as e:
            msg = str(e)[:160].replace("\n", " ")
            print(f"{tag}: FAILED {msg}", flush=True)
    # the auto chooser
    try:
        t = timeit(lambda a: connected_components_pallas(a, reach=reach),
                   assignment)
        print(f"auto chooser: {t:6.2f} ms", flush=True)
    except Exception:
        traceback.print_exc()
    print("AB_CCA_DONE", flush=True)


if __name__ == "__main__":
    main()
