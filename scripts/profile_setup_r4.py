"""Round-4 setup/loop attribution under a verified-healthy tunnel.

The r4 queue's profile_r4 run (probe 186 ms — degraded-ish) attributed
4.35 ms to stage_setup while round-3c measured the same stage at 1.76 ms;
this script re-measures with finer sub-stages so the conflict can be
resolved before any optimization work targets the wrong stage.

Sub-stages itemized:
  * LAB kernel alone (rgb_to_lab_planar)
  * LAB + seed-color gather (the full stage_setup)
  * _pad_planes_for_pallas on the planes
  * the three per-rem _subsample_stack slices (loop-invariant prep)
  * loop prefix with 1 / 5 / 10 iterations (per-iteration marginal)
  * one iteration's candidate build alone (clamp + visit keys + sorts)
  * one iteration's update alone (accumulate + apply_means)

Sync trap (NOTES.md): every timing loop syncs by an on-device reduce to a
scalar materialized with np.asarray; block_until_ready is unreliable here.
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


def _scalarize(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    acc = jnp.zeros((), jnp.float32)
    for x in leaves:
        acc = acc + jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32
                            else x)
    return acc


def timeit(fn, *args, n=40, warmup=3):
    f = jax.jit(lambda *a: _scalarize(fn(*a)))
    for _ in range(warmup):
        r = f(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / n * 1e3


def probe():
    @jax.jit
    def chain(x):
        def body(i, a):
            return a * jnp.float32(1.000001) + jnp.float32(i)
        return jnp.sum(jax.lax.fori_loop(0, 64, body, x))
    x = jnp.ones((128,), jnp.float32)
    np.asarray(chain(x))
    t0 = time.perf_counter()
    for i in range(3):
        np.asarray(chain(x + np.float32(i)))
    return (time.perf_counter() - t0) / 3 * 1e3


def photo(H, W, seed=0):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize((W + 512, H + 512),
                                                        Image.BILINEAR))
    off = (16 * seed) % 512
    off2 = (80 * seed + 128) % 512
    return np.ascontiguousarray(img[off:off + H, off2:off2 + W])


def main():
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    image = photo(H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)
    stride = 3

    print(f"probe: {probe():.1f} ms (healthy ~28-40)", flush=True)

    def e2e(image, s):
        out = pipeline.iterate_graph(image, s, cfg, scal, 10, 3)
        return out.labels, out.clusters, out.cca_tie, out.cand_overflow
    t_e2e = timeit(e2e, img_dev, st)
    print(f"E2E iterate_graph         : {t_e2e:6.2f} ms "
          "(r3c baseline 10.3-10.7)", flush=True)

    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_planar
    t_lab = timeit(lambda im: rgb_to_lab_planar(im), img_dev)
    print(f"LAB kernel alone          : {t_lab:6.2f} ms", flush=True)

    t_setup = timeit(
        lambda im, s: pipeline.stage_setup(im, s, cfg, scal)[:2],
        img_dev, st)
    print(f"stage_setup (lab + seed)  : {t_setup:6.2f} ms", flush=True)

    def setup_pad(im, s):
        planes, st_c, _ = pipeline.stage_setup(im, s, cfg, scal)
        return pipeline._pad_planes_for_pallas(planes, cfg), st_c.r
    t_pad = timeit(setup_pad, img_dev, st)
    print(f"  + pad_planes            : {t_pad:6.2f} ms "
          f"(marginal {t_pad - t_setup:+6.2f})", flush=True)

    def setup_subs(im, s):
        planes, st_c, _ = pipeline.stage_setup(im, s, cfg, scal)
        p3 = pipeline._pad_planes_for_pallas(planes, cfg)
        Hp = p3.shape[1]
        outs = []
        for rem in range(stride):
            p3s, _ = pipeline._subsample_stack(p3, Hp, H, stride, rem, 0)
            outs.append(p3s)
        return outs, st_c.r
    t_subs = timeit(setup_subs, img_dev, st)
    print(f"  + 3x subsample stacks   : {t_subs:6.2f} ms "
          f"(marginal {t_subs - t_pad:+6.2f})", flush=True)

    # loop prefixes: 1 / 5 / 10 iterations through the real stage functions
    def upto_loop(n_iter):
        def fn(im, s):
            planes, st_c, lsc_state = pipeline.stage_setup(im, s, cfg, scal)
            st2, assignment, _, cov, _ = pipeline.stage_loop(
                planes, st_c, lsc_state, cfg, scal, n_iter, stride)
            return assignment, st2.y
        return fn
    prev = t_setup
    for n_iter in (1, 5, 10):
        t = timeit(upto_loop(n_iter), img_dev, st)
        print(f"setup + loop[{n_iter:2d}]          : {t:6.2f} ms "
              f"(marginal {t - prev:+6.2f})", flush=True)
        prev = t

    # one iteration's pieces, isolated on device-resident inputs
    st_c = jax.jit(lambda im, s: pipeline.stage_setup(im, s, cfg, scal)[1])(
        img_dev, st)
    st_c = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), st_c)

    def cand_only(s):
        stf = pipeline._clamp_centers(s, cfg)
        cand, cov = pipeline.build_candidates(stf.y, stf.x, stf.is_active,
                                              cfg)
        return cand
    t_cand = timeit(cand_only, st_c, n=60)
    print(f"1x candidate build        : {t_cand:6.2f} ms", flush=True)

    # the same build CHAINED 10x (defeats CSE; models the 10-iteration cost)
    def cand_chain(s):
        stf = pipeline._clamp_centers(s, cfg)
        y, x = stf.y, stf.x
        acc = jnp.zeros((), jnp.int32)
        for i in range(10):
            cand, _ = pipeline.build_candidates(
                y + (acc % 1), x, stf.is_active, cfg)
            acc = acc + jnp.sum(cand)
        return acc
    t_cand10 = timeit(cand_chain, st_c, n=20)
    print(f"10x chained cand build    : {t_cand10:6.2f} ms "
          f"({(t_cand10) / 10:5.2f} /iter)", flush=True)


if __name__ == "__main__":
    main()
