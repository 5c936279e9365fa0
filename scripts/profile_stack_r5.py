"""Round-5 A/B: stacked (frame-grid) batch mode vs lax.map, on real TPU.

Measures ms/frame for B in {8, 16, 32} with the bench's honest pipelined
pattern: frames staged on-device once, >= REPS queued executions, ONE
on-device scalar-reduce sync (NOTES.md measurement traps: block_until_ready
is broken on axon; each blocked dispatch costs ~28 ms tunnel round-trip).

Also itemizes the stacked pipeline's stages (prefix-composed marginals) at
B=32 so regressions are attributable.

Run ALONE (the tunnel admits ~one client process).
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
from fast_slic_tpu.parallel import stack as stack_lib

H, W, K = 720, 1280, 1600
MAX_ITER, STRIDE = 10, 3


def probe():
    t0 = time.perf_counter()
    x = jnp.sum(jnp.ones((128, 128), jnp.float32))
    v = float(np.asarray(x))
    return (time.perf_counter() - t0) * 1e3, v


def photo_frames(B, seed=0):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize(
        (W + 256, H + 256), Image.BILINEAR))
    frames = np.stack([
        np.ascontiguousarray(img[(7 * b) % 256:(7 * b) % 256 + H,
                                 (11 * b) % 256:(11 * b) % 256 + W])
        for b in range(B)])
    return frames


def timeit_queued(fn, args, reps=12, warmup=2):
    """Queue `reps` dependency-chained executions, sync once via an
    on-device scalar reduce."""
    f = jax.jit(lambda *a: jnp.sum(fn(*a)[0].astype(jnp.float32)))
    for _ in range(warmup):
        r = f(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = f(*args)
    np.asarray(acc)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    pm, _ = probe()
    print(f"probe {pm:.1f} ms", flush=True)

    for B in (8, 16, 32):
        frames = photo_frames(B)
        frames_dev = jnp.asarray(frames)
        sts = [cl.initialize_clusters(f, K) for f in frames]
        st_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
        st_b = jax.tree.map(jnp.asarray, st_b)
        cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
        sc = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)

        # map mode (the round-4 official path)
        def map_step(images, st):
            def one(args):
                image, s = args
                out = pipeline.iterate_graph(image, s, cfg, sc, MAX_ITER,
                                             STRIDE)
                return out.labels
            return (jax.lax.map(one, (images, st)),)

        # stacked mode
        def stack_step(images, st):
            out = stack_lib.iterate_graph_stacked(images, st, cfg, sc,
                                                  MAX_ITER, STRIDE)
            return (out.labels,)

        for name, fn in (("map", map_step), ("stack", stack_step)):
            try:
                t = timeit_queued(fn, (frames_dev, st_b), reps=10)
                mpixs = B * H * W / (t / 1e3) / 1e6
                print(f"B={B:3d} {name:6s}: {t / B:7.2f} ms/frame  "
                      f"{mpixs:7.2f} Mpix/s", flush=True)
            except Exception as e:
                print(f"B={B:3d} {name:6s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        pm, _ = probe()
        print(f"probe {pm:.1f} ms", flush=True)

    # stage itemization at B=32 (prefix-composed marginals)
    B = 32
    frames_dev = jnp.asarray(photo_frames(B))
    sts = [cl.initialize_clusters(f, K) for f in np.asarray(frames_dev)]
    st_b = jax.tree.map(jnp.asarray,
                        jax.tree.map(lambda *xs: jnp.stack(xs), *sts))
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    sc = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)

    for mi in (0, 1, 4, 10):
        def fn(images, st, mi=mi):
            out = stack_lib.iterate_graph_stacked(images, st, cfg, sc, mi,
                                                  STRIDE)
            return (out.labels[:, ::97, ::97],)
        t = timeit_queued(fn, (frames_dev, st_b), reps=8)
        print(f"stack B=32 mi={mi:2d}: {t / B:7.2f} ms/frame "
              f"(total {t:8.1f} ms)", flush=True)
    pm, _ = probe()
    print(f"probe {pm:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
