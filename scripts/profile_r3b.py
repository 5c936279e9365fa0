"""Fine-grained round-3 profiling: loop component costs under real
composition (defeating CSE/hoisting), LAB kernel interior vs wrapper."""
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
        acc = acc + jnp.sum(x.astype(jnp.float32))
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


def photo(H, W, seed=0):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize((W + 512, H + 512),
                                                        Image.BILINEAR))
    return np.ascontiguousarray(img[0:H, 128:128 + W])


def main():
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    image = photo(H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)
    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_pallas
    from fast_slic_tpu.pallas.assign_tpu import (prepare_cell_fields,
                                                 assign_pallas_standard)
    from fast_slic_tpu.config import ARCH_PALLAS

    planes = jnp.asarray(np.asarray(jax.jit(rgb_to_lab_pallas)(img_dev)))
    p3 = jnp.asarray(np.asarray(jax.jit(
        lambda p: pipeline._pad_planes_for_pallas(p, cfg))(planes)))
    GH, GW = pipeline.cell_grid_shape(cfg)

    # ---- chained micro-costs: x20 dependency-chained, +i defeats CSE
    N = 20

    def chain_candidates(st_):
        y = st_.y
        acc = jnp.zeros((), jnp.int32)
        for i in range(N):
            cand, _ = pipeline.build_candidates(y + (i % 2) * 1e-6,
                                                st_.x, st_.is_active, cfg)
            acc = acc + cand[0, 0, 0]
            y = y + (acc % 2).astype(jnp.float32) * 1e-7
        return acc

    def chain_fields(st_):
        table = jnp.stack([st_.y, st_.x, st_.r, st_.g, st_.b], axis=1)
        cand, _ = pipeline.build_candidates(st_.y, st_.x, st_.is_active, cfg)
        acc = jnp.zeros((), jnp.float32)
        for i in range(N):
            fields = prepare_cell_fields(cand, table + acc * 1e-9)
            acc = acc + fields[0][0, 0]
        return acc

    def chain_assign(st_):
        table = jnp.stack([st_.y, st_.x, st_.r, st_.g, st_.b], axis=1)
        cand, _ = pipeline.build_candidates(st_.y, st_.x, st_.is_active, cfg)
        fields = prepare_cell_fields(cand, table)
        old = jnp.full((p3.shape[1], p3.shape[2]), UNASSIGNED, jnp.int32)
        for i in range(N):
            # stride-3 subsampled pass like the loop does
            p3_sub, Hs = pipeline._subsample_stack(p3, p3.shape[1], H, 3,
                                                   i % 3, 0)
            old_sub = old[:p3_sub.shape[1], :]
            a, d = assign_pallas_standard(
                p3_sub, old_sub, fields, jnp.asarray(scal.coef, jnp.float32),
                jnp.asarray(i % 3, jnp.int32), 3, S=cfg.S, GH=GH, GW=GW,
                C=16, H=H, W=W, manhattan=True, interpret=False)
            old = old.at[:a.shape[0], :].set(a)
        return old

    def chain_update(st_):
        asg = jnp.full((H, W), UNASSIGNED, jnp.int32)
        # a realistic assignment (grid blocks)
        ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        asg = jnp.minimum((ii // cfg.S) * GW + jj // cfg.S, K - 1)
        st_c = st_
        for i in range(N):
            st_c = pipeline.update_xla(planes, asg + (i % 2), st_c, cfg,
                                       i % 3, 3)
        return st_c.y

    for name, fn in (("build_candidates", chain_candidates),
                     ("cell_fields", chain_fields),
                     ("assign_kernel(sub)", chain_assign),
                     ("update", chain_update)):
        t = timeit(fn, st, n=20) / N
        print(f"{name:20s}: {t:8.3f} ms/iter", flush=True)

    # ---- LAB: kernel interior (prepacked rows) vs full wrapper
    n = H * W
    tile = 8192
    Np = -(-n // tile) * tile
    rows = jnp.zeros((8, Np), jnp.int32)
    flat = img_dev.astype(jnp.int32).reshape(n, 3)
    rows = rows.at[0, :n].set(flat[:, 0]).at[1, :n].set(flat[:, 1]
        ).at[2, :n].set(flat[:, 2])
    rows = jnp.asarray(np.asarray(rows))

    from fast_slic_tpu.pallas import lut_tpu
    import functools as ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fast_slic_tpu.ops import cielab as cie

    lab2d = np.zeros((lut_tpu._N_HI, 128), np.int32)
    lab2d.reshape(-1)[: cie._LAB_TBL_NP.shape[0]] = cie._LAB_TBL_NP
    srgb2d = np.zeros((2, 128), np.int32)
    srgb2d.reshape(-1)[:256] = cie._SRGB_TBL_NP
    lab2d = jnp.asarray(lab2d)
    srgb2d = jnp.asarray(srgb2d)

    def raw_kernel(rows_):
        out = pl.pallas_call(
            lut_tpu._lab_kernel,
            grid=(Np // tile,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, tile), lambda i: (0, i))],
            out_specs=pl.BlockSpec((8, tile), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((8, Np), jnp.int32),
            interpret=False,
        )(srgb2d, lab2d, rows_)
        return out

    def chain_raw(rows_):
        r = rows_
        for i in range(N):
            r = raw_kernel(r)[:, :Np] + (i % 2)
            r = jnp.concatenate([r[:3] % 256, r[3:]], 0)
        return r

    t = timeit(chain_raw, rows, n=10) / N
    print(f"lab kernel interior : {t:8.3f} ms", flush=True)

    def chain_full(img):
        x = img
        for i in range(N):
            p = rgb_to_lab_pallas(x)
            x = (p % 256).astype(jnp.uint8)
        return x

    t = timeit(chain_full, img_dev, n=10) / N
    print(f"lab full wrapper    : {t:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
