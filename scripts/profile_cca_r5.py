"""CCA short-round schedule A/B on real TPU: short_steps in {full, 3, 4, 5}
on a REAL post-full-assign 720p fragment map (the r5b single-frame CCA
marginal read 4.28 ms vs r4's 3.22 — is the short schedule net-negative?).

Times the cc propagation (iota seeds) in isolation, chained to defeat CSE;
sync via scalar reduce (NOTES.md traps).
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


def probe():
    t0 = time.perf_counter()
    np.asarray(jnp.sum(jnp.ones((128, 128), jnp.float32)))
    return (time.perf_counter() - t0) * 1e3


def photo(H, W):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize(
        (W + 512, H + 512), Image.BILINEAR))
    return np.ascontiguousarray(img[0:H, 128:128 + W])


def main():
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    sc = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    image = jnp.asarray(photo(H, W))
    st0 = jax.tree.map(jnp.asarray, cl.initialize_clusters(
        np.asarray(image), K))
    print(f"probe {probe():.1f} ms", flush=True)

    # materialize a real raw assignment (post full assign)
    @jax.jit
    def raw_fn(image, st):
        planes, st2, ls = pipeline.stage_setup(image, st, cfg, sc)
        st3, assignment, lsc_cent, cov, _ = pipeline.stage_loop(
            planes, st2, ls, cfg, sc, 10, 3)
        st4, assignment, md, cov2 = pipeline.stage_full_assign(
            planes, st3, ls, lsc_cent, assignment, cfg, sc)
        return assignment
    raw = jnp.asarray(np.asarray(raw_fn(image, st0)).astype(np.int32))
    print("raw ready", flush=True)

    from fast_slic_tpu.pallas.cca_tpu import propagate_min_pallas

    iota = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
            + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))

    S = cfg.S
    for ss in (0, 3, 4, 5):
        def fn(raw_a, ss=ss):
            # chain 3 cc propagations with content perturbation to defeat
            # CSE; each is the real 2-pass bounded-mode call
            acc = jnp.int32(0)
            r = raw_a
            for i in range(3):
                out = propagate_min_pallas(
                    r, iota, reach=2 * S + 4, bounded_h=2 * S + 1,
                    content_bounded=jnp.logical_not(
                        jnp.any(r == 0xFFFF)),
                    short_steps=ss)
                acc = acc + jnp.sum(out)
                r = jnp.where((r + i) % 997 == 0, r + 1, r)  # perturb
            return (acc,)
        t = timeit(fn, (raw,))
        label = "full" if ss == 0 else f"k={ss}"
        print(f"cc-propagation short_steps {label:5s}: {t / 3:7.2f} ms/pass",
              flush=True)
    print(f"probe {probe():.1f} ms", flush=True)


def timeit(fn, args, reps=10, warmup=2):
    f = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree.leaves(fn(*a))))
    for _ in range(warmup):
        r = f(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps * 1e3


if __name__ == "__main__":
    main()
