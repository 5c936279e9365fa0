"""Round-5b consolidated TPU measurements (single process, sequential):

1. Single-frame 720p prefix marginals (setup/loop/full/cca) with the
   round-5 changes: composite-key candidate sort, CCA short-round
   schedule, raised VMEM limits, orphan-target parking.
2. cfg3 (1080p preemptive) and cfg4 (1080p LSC) E2E — strip=144 2-pass
   CCA + planar LSC features + rows=64 LSC assign strips.
3. The REAL iterate_graph_stacked at B=8/32 post-fixes (settles the
   37 ms/frame vs 13.6 ms/frame anatomy discrepancy).

Honest sync per NOTES.md (scalar-reduce sync; probes around sections).
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


def photo(H, W, seed=0):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize(
        (W + 512, H + 512), Image.BILINEAR))
    off = (16 * seed) % 512
    return np.ascontiguousarray(img[off:off + H, 128:128 + W])


def timeit(fn, args, reps=12, warmup=2):
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


def single_frame_prefixes():
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    sc = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    image = jnp.asarray(photo(H, W))
    st0 = jax.tree.map(jnp.asarray, cl.initialize_clusters(
        np.asarray(image), K))

    def upto(stage):
        def fn(image, st):
            planes, st2, lsc_state = pipeline.stage_setup(image, st, cfg,
                                                          sc)
            if stage == "setup":
                return st2.y, planes[:, ::97, ::97]
            st3, assignment, lsc_cent, cov, _ = pipeline.stage_loop(
                planes, st2, lsc_state, cfg, sc, 10, 3)
            if stage == "loop":
                return st3.y, assignment[::97, ::97]
            st4, assignment, md, cov2 = pipeline.stage_full_assign(
                planes, st3, lsc_state, lsc_cent, assignment, cfg, sc)
            if stage == "full":
                return st4.y, assignment[::97, ::97]
            labels, tie = pipeline.stage_cca(assignment, cfg, sc)
            return labels[::97, ::97], tie
        return fn

    prev = 0.0
    for stage in ("setup", "loop", "full", "cca"):
        t = timeit(upto(stage), (image, st0), reps=12)
        print(f"single 720p upto {stage:6s}: {t:7.2f} ms  (+{t - prev:6.2f})",
              flush=True)
        prev = t
    print(f"single 720p E2E {prev:.2f} ms = {720 * 1280 / prev / 1e3:.1f} "
          f"Mpix/s device-side", flush=True)


def cfg_e2e(name, cfg, sc_args, reps=8):
    image = jnp.asarray(photo(cfg.H, cfg.W))
    st0 = jax.tree.map(jnp.asarray, cl.initialize_clusters(
        np.asarray(image), cfg.K))
    sc = pipeline.derive_scalars(cfg, *sc_args)

    def fn(image, st):
        out = pipeline.iterate_graph(image, st, cfg, sc, 10, 3)
        return (out.labels[::97, ::97], out.cca_tie)

    t = timeit(fn, (image, st0), reps=reps)
    print(f"{name}: {t:7.2f} ms", flush=True)


def stacked_real(B):
    from fast_slic_tpu.parallel import stack as sl
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    sc = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    frames = np.stack([photo(H, W, seed=b) for b in range(B)])
    sts = [cl.initialize_clusters(f, K) for f in frames]
    st_b = jax.tree.map(jnp.asarray,
                        jax.tree.map(lambda *xs: jnp.stack(xs), *sts))
    frames_dev = jnp.asarray(frames)

    def fn(images, st):
        out = sl.iterate_graph_stacked(images, st, cfg, sc, 10, 3)
        return (out.labels[:, ::97, ::97],)

    t = timeit(fn, (frames_dev, st_b), reps=8)
    print(f"stacked REAL B={B}: {t / B:7.2f} ms/frame "
          f"({B * H * W / t / 1e3:.1f} Mpix/s)", flush=True)


def main():
    print(f"probe {probe():.1f} ms", flush=True)
    single_frame_prefixes()
    print(f"probe {probe():.1f} ms", flush=True)
    stacked_real(8)
    stacked_real(32)
    print(f"probe {probe():.1f} ms", flush=True)
    cfg_e2e("cfg3 1080p preemptive",
            StaticConfig(H=1080, W=1920, K=1600, arch="pallas",
                         preemptive=True), (10.0, 0.1, 0.05))
    print(f"probe {probe():.1f} ms", flush=True)
    cfg_e2e("cfg4 1080p LSC",
            StaticConfig(H=1080, W=1920, K=1600, arch="pallas",
                         variant="lsc"), (10.0, 0.1, 0.05))
    print(f"probe {probe():.1f} ms", flush=True)


if __name__ == "__main__":
    main()
