"""Round-4 loop-glue itemization (standard variant, 720p K=1600).

The loop reads ~5.2 ms for 10 iterations while the assign+update kernels
account for only ~1.9 — this script attributes the remaining glue by
running the exact `_stage_loop_subresident` body with pieces toggled
(CSE-proof: every variant keeps a feedback dependency through the cluster
state), plus isolated chained measurements of the candidate build's
internal stages (the [9K] two-key sort and the [num_cells*C] scatter are
the round-4 suspects: scatters execute serially at ~8 ns/element).

Sync trap (NOTES.md): syncs by an on-device reduce to a scalar.
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


def timeit(fn, *args, n=20, warmup=3):
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
    stride = 3
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    image = photo(H, W)
    st0 = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)

    print(f"probe: {probe():.1f} ms (healthy ~28-40)", flush=True)

    planes, st2, _ = jax.jit(
        lambda i, s: pipeline.stage_setup(i, s, cfg, scal))(img_dev, st0)
    p3 = jax.jit(lambda p: pipeline._pad_planes_for_pallas(p, cfg))(planes)
    planes, st2, p3 = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x)), [planes, st2, p3])
    Hp, Wp = p3.shape[1], p3.shape[2]
    Hs = -(-H // stride)
    pad = Hs * stride - H
    coef = jnp.asarray(scal.coef, jnp.float32)

    p3_subs, p_subs, vrows, n_reals = [], [], [], []
    pv_full = jnp.concatenate(
        [planes, jnp.zeros((3, pad, W), planes.dtype)], 1
    ).reshape(3, Hs, stride, W)
    for rem in range(stride):
        p3s, _ = pipeline._subsample_stack(p3, Hp, H, stride, rem, 0)
        p3_subs.append(jnp.asarray(np.asarray(p3s)))
        p_subs.append(jnp.asarray(np.asarray(pv_full[:, :, rem])))
        abs_r = np.arange(Hs) * stride + rem
        vrows.append(jnp.asarray((abs_r < H)[:, None]))
        n_reals.append(int(-(-(H - rem) // stride)))
    Hsp = p3_subs[0].shape[1]

    GH, GW = pipeline.cell_grid_shape(cfg)
    C = cfg.cand_slots
    cand0 = jnp.asarray(np.asarray(jax.jit(
        lambda y, x, a: pipeline.build_candidates(y, x, a, cfg)[0])(
            st2.y, st2.x, st2.is_active)))

    # synthetic assignment for skip-assign runs (state-dependent, S-cell
    # pattern so the update segsum band structure stays honest)
    sub_rows = jnp.arange(Hsp) * stride
    a_grid = jnp.minimum(
        (sub_rows[:, None] // cfg.S) * GW +
        jnp.arange(Wp)[None, :] // cfg.S, K - 2).astype(jnp.int32)

    N = 6

    def make_loop(skip):
        def fn(st_in):
            st = st_in
            a_subs = [jnp.full((Hsp, Wp), UNASSIGNED, jnp.int32)
                      for _ in range(stride)]
            acc = jnp.zeros((), jnp.float32)
            for i in range(N):
                rem = i % stride
                if "clamp" not in skip:
                    st = pipeline._clamp_centers(st, cfg)
                if "cand" not in skip:
                    cand, _ = pipeline.build_candidates(
                        st.y, st.x, st.is_active, cfg)
                else:
                    # perturb only NON-EMPTY slots: bumping an empty slot
                    # (-1) to cluster id 0 would inflate the assign kernel's
                    # per-slot work vs the real loop (ADVICE r4)
                    delta = st.y[0].astype(jnp.int32) % 2
                    cand = jnp.where(cand0 >= 0,
                                     jnp.minimum(cand0 + delta, K - 1), -1)
                if "assign" not in skip:
                    a_new, _ = pipeline.run_assign_kernel(
                        p3_subs[rem], None, a_subs[rem], st, cand, cfg,
                        coef, rem, stride, None)
                else:
                    a_new = a_grid + (jnp.abs(cand[0, 0, 0]) % 2)
                a_subs[rem] = a_new
                a_upd = jnp.where(vrows[rem], a_new[:Hs, :W], UNASSIGNED)
                if "update" not in skip:
                    counts, sums = pipeline.update_accumulate_presliced(
                        p_subs[rem], a_upd, cfg, rem, stride, None)
                    if "apply" not in skip:
                        st = pipeline.update_apply_means_rows(
                            counts, sums, st, cfg)
                    else:
                        import dataclasses
                        st = dataclasses.replace(
                            st, y=st.y + counts[:K].astype(jnp.float32)
                            * 1e-9)
                acc = acc + jnp.sum(a_new[0, :8])
            return acc, st.y
        return fn

    t_full = timeit(make_loop(()), st2)
    print(f"loop x{N} FULL            : {t_full:7.2f} ms "
          f"({t_full / N:5.3f} /iter)", flush=True)
    for skip, label in ((("cand",), "no cand build "),
                        (("clamp",), "no clamp      "),
                        (("apply",), "no apply_means"),
                        (("update", "apply"), "no update     "),
                        (("assign",), "no assign krnl"),
                        (("cand", "assign"), "no cand+assign")):
        t = timeit(make_loop(skip), st2)
        print(f"loop x{N} {label}  : {t:7.2f} ms  "
              f"(marginal {(t_full - t) / N:+6.3f} /iter)", flush=True)

    # ---- candidate build internals, chained (CSE-proof feedback) --------
    num_cells = GH * GW

    def chain_build(n_inner):
        def fn(y):
            acc = jnp.zeros((), jnp.float32)
            yy = y
            for i in range(n_inner):
                cand, _ = pipeline.build_candidates(
                    yy, st2.x, st2.is_active, cfg)
                yy = yy + cand[0, 0, 0].astype(jnp.float32) * 1e-9
                acc = acc + cand[1, 1, 1]
            return acc, yy
        return fn

    t1 = timeit(chain_build(2), st2.y)
    t2 = timeit(chain_build(12), st2.y)
    print(f"build_candidates chained: {(t2 - t1) / 10:6.3f} ms each",
          flush=True)

    # sort alone
    key0 = jnp.asarray(np.asarray(jax.jit(
        lambda y, x: pipeline.visit_order_key(y, x, cfg))(st2.y, st2.x)))

    def chain_sort(n_inner):
        def fn(k9, c9):
            acc = jnp.zeros((), jnp.int32)
            kk = k9
            for i in range(n_inner):
                sc, okey = jax.lax.sort((c9, kk), num_keys=2)
                kk = kk + (okey[0] % 2)
                acc = acc + sc[0]
            return acc, kk
        return fn

    c9 = jnp.tile(jnp.arange(K, dtype=jnp.int32) % num_cells, 9)
    k9 = jnp.tile(key0, 9)
    t1 = timeit(chain_sort(2), k9, c9)
    t2 = timeit(chain_sort(12), k9, c9)
    print(f"[9K] two-key sort chained: {(t2 - t1) / 10:6.3f} ms each",
          flush=True)

    # scatter alone ([9K] -> [num_cells*C+1])
    def chain_scatter(n_inner):
        def fn(okey, target):
            acc = jnp.zeros((), jnp.int32)
            ok = okey
            for i in range(n_inner):
                ckey = jnp.full([num_cells * C + 1], jnp.int32(2 ** 30)
                                ).at[target].set(ok)
                ok = ok + (ckey[0] % 2)
                acc = acc + ckey[1]
            return acc, ok
        return fn

    tgt = jnp.minimum(jnp.arange(9 * K, dtype=jnp.int32) * 2,
                      num_cells * C)
    t1 = timeit(chain_scatter(2), k9, tgt)
    t2 = timeit(chain_scatter(12), k9, tgt)
    print(f"[9K] scatter chained    : {(t2 - t1) / 10:6.3f} ms each",
          flush=True)

    # fields prep alone (prepare_cell_fields + table stack)
    from fast_slic_tpu.pallas.assign_tpu import prepare_cell_fields

    def chain_fields(n_inner):
        def fn(y):
            acc = jnp.zeros((), jnp.float32)
            yy = y
            for i in range(n_inner):
                table = jnp.stack([yy, st2.x, st2.r, st2.g, st2.b], axis=1)
                fields = prepare_cell_fields(cand0, table)
                leaf = jax.tree.leaves(fields)[0]
                yy = yy + leaf.reshape(-1)[0] * 1e-9
                acc = acc + jnp.sum(leaf.reshape(-1)[:2])
            return acc, yy
        return fn

    t1 = timeit(chain_fields(2), st2.y)
    t2 = timeit(chain_fields(12), st2.y)
    print(f"fields prep chained     : {(t2 - t1) / 10:6.3f} ms each",
          flush=True)

    print(f"probe: {probe():.1f} ms", flush=True)


if __name__ == "__main__":
    main()
