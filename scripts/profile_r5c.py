"""Round-5c: (a) single-frame 720p prefix marginals with the padded-direct
update, (b) assign-kernel rows=64 vs 128 A/B under the raised VMEM limit,
(c) composed full-iterate E2E (the map-mode per-frame program)."""
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


def timeit(fn, *args, n=14, warmup=2):
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
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    sc = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    image = jnp.asarray(photo(H, W))
    st0 = jax.tree.map(jnp.asarray, cl.initialize_clusters(
        np.asarray(image), K))
    print(f"probe {probe():.1f} ms", flush=True)

    def upto(stage):
        def fn(image, st):
            planes, st2, ls = pipeline.stage_setup(image, st, cfg, sc)
            if stage == "setup":
                return st2.y, planes[:, ::97, ::97]
            st3, assignment, lsc_cent, cov, _ = pipeline.stage_loop(
                planes, st2, ls, cfg, sc, 10, 3)
            if stage == "loop":
                return st3.y, assignment[::97, ::97]
            st4, assignment, md, cov2 = pipeline.stage_full_assign(
                planes, st3, ls, lsc_cent, assignment, cfg, sc)
            if stage == "full":
                return st4.y, assignment[::97, ::97]
            labels, tie = pipeline.stage_cca(assignment, cfg, sc)
            return labels[::97, ::97], tie
        return fn

    # composed E2E FIRST (the exact map-mode per-frame program) — also
    # serves as session warm-up so the first prefix section isn't inflated
    def e2e(image, st):
        out = pipeline.iterate_graph(image, st, cfg, sc, 10, 3)
        return (out.labels[::97, ::97], out.cca_tie)
    t = timeit(e2e, image, st0)
    print(f"composed E2E: {t:7.2f} ms = {H * W / t / 1e3:.1f} Mpix/s",
          flush=True)

    prev = 0.0
    for stage in ("setup", "loop", "full", "cca"):
        t = timeit(upto(stage), image, st0)
        print(f"upto {stage:6s}: {t:7.2f} ms  (+{t - prev:6.2f})",
              flush=True)
        prev = t
    print(f"probe {probe():.1f} ms", flush=True)

    # assign rows A/B
    @jax.jit
    def prep(image, st):
        planes, st2, ls = pipeline.stage_setup(image, st, cfg, sc)
        p3 = pipeline._pad_planes_for_pallas(planes, cfg)
        cand, _ = pipeline.build_candidates(st2.y, st2.x, st2.is_active,
                                            cfg)
        return p3, st2, cand
    p3, st2, cand = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                 prep(image, st0))
    p3_sub, _ = pipeline._subsample_stack(p3, p3.shape[1], H, 3, 0, 0)
    p3_sub = jnp.asarray(np.asarray(p3_sub))

    from fast_slic_tpu.pallas.assign_tpu import (assign_pallas_standard,
                                                 prepare_cell_fields)
    GH, GW = pipeline.cell_grid_shape(cfg)
    table = jnp.stack([st2.y, st2.x, st2.r, st2.g, st2.b], axis=1)
    fields = tuple(jnp.asarray(np.asarray(f))
                   for f in prepare_cell_fields(cand, table))
    coef = jnp.asarray(sc.coef, jnp.float32)
    for stride, planes_in in ((3, p3_sub), (1, p3)):
        old = jnp.full(planes_in.shape[1:], UNASSIGNED, jnp.int32)
        for rows in (64, 128):
            if planes_in.shape[1] % rows:
                continue

            def fn(planes_x, old_x, rows=rows, stride=stride):
                a = old_x
                acc = jnp.float32(0)
                for i in range(6):
                    a, d = assign_pallas_standard(
                        planes_x, a, fields, coef,
                        jnp.asarray(i % stride, jnp.int32), stride,
                        S=cfg.S, GH=GH, GW=GW, C=cand.shape[-1], H=H, W=W,
                        manhattan=True, interpret=False, rows=rows)
                    acc = acc + jnp.sum(d[::97, ::127])
                return (acc, a[::97, ::127])
            t = timeit(fn, planes_in, old, n=10)
            print(f"assign stride={stride} rows={rows:4d}: "
                  f"{t / 6:7.3f} ms/pass", flush=True)
    print(f"probe {probe():.1f} ms", flush=True)


if __name__ == "__main__":
    main()
