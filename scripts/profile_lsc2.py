"""LSC 1080p LOOP itemization (round 4): the queue run attributed
64.5 ms of cfg4's 91.6 to the 10-iteration loop, of which the assign pass
(~1.5 subsampled) + after_update (1.44) + update (~0.4) explain barely half
— this script itemizes one real iteration body with pieces toggled, using
composed chains with feedback (CSE-proof) over device-resident inputs.

Reproduces the exact `_stage_loop_subresident` LSC iteration body
(pipeline.py) with skip flags; marginals = full - skipped.
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
from fast_slic_tpu.ops import lsc as lsc_ops


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


def main():
    H, W, K = 1080, 1920, 1600
    stride = 3
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas", variant="lsc")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize((W + 512, H + 512),
                                                        Image.BILINEAR))
    image = np.ascontiguousarray(img[0:H, 128:128 + W])
    st0 = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)

    print(f"probe: {probe():.1f} ms (healthy ~28-40)", flush=True)

    # device-resident loop inputs, materialized once
    planes, st2, lsc_state = jax.jit(
        lambda i, s: pipeline.stage_setup(i, s, cfg, scal))(img_dev, st0)
    lsc_feats, lsc_w, lsc_cent0 = lsc_state
    p3 = jax.jit(lambda p: pipeline._pad_planes_for_pallas(p, cfg))(planes)
    fp3 = jax.jit(lambda f: pipeline._pad_planes_for_pallas(
        f, cfg, jnp.float32, planar=False))(lsc_feats)
    mats = [planes, st2, lsc_feats, lsc_w, lsc_cent0, p3, fp3]
    mats = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), mats)
    planes, st2, lsc_feats, lsc_w, lsc_cent0, p3, fp3 = mats

    Hp, Wp = p3.shape[1], p3.shape[2]
    Hs = -(-H // stride)
    pad = Hs * stride - H
    coef = jnp.asarray(scal.coef, jnp.float32)

    p3_subs, fp3_subs, p_subs, vrows = [], [], [], []
    pv_full = jnp.concatenate(
        [planes, jnp.zeros((3, pad, W), planes.dtype)], 1
    ).reshape(3, Hs, stride, W)
    for rem in range(stride):
        p3s, _ = pipeline._subsample_stack(p3, Hp, H, stride, rem, 0)
        fp3s, _ = pipeline._subsample_stack(fp3, Hp, H, stride, rem, 0.0)
        p3_subs.append(jnp.asarray(np.asarray(p3s)))
        fp3_subs.append(jnp.asarray(np.asarray(fp3s)))
        p_subs.append(jnp.asarray(np.asarray(pv_full[:, :, rem])))
        abs_r = np.arange(Hs) * stride + rem
        vrows.append(jnp.asarray((abs_r < H)[:, None]))
    Hsp = p3_subs[0].shape[1]
    n_reals = [int(-(-(H - r) // stride)) for r in range(stride)]

    N = 5

    # realistic synthetic assignment for skip-assign runs: the S-cell grid
    # pattern in SUBSAMPLED row space (keeps downstream segsum band
    # structure honest; a constant map would make after_update degenerate)
    GW_ = -(-W // cfg.S)
    sub_rows = jnp.arange(Hsp) * stride  # approx absolute rows
    a_grid = jnp.minimum(
        (sub_rows[:, None] // cfg.S) * GW_ +
        jnp.arange(Wp)[None, :] // cfg.S, K - 2).astype(jnp.int32)

    def make_loop(skip):
        def fn(st_in, cent_in):
            st = st_in
            lsc_cent = cent_in
            a_subs = [jnp.full((Hsp, Wp), UNASSIGNED, jnp.int32)
                      for _ in range(stride)]
            acc = jnp.zeros((), jnp.float32)
            for i in range(N):
                rem = i % stride
                st = pipeline._clamp_centers(st, cfg)
                if "cand" not in skip:
                    cand, _ = pipeline.build_candidates(
                        st.y, st.x, st.is_active, cfg)
                else:
                    cand = jnp.zeros(
                        (-(-H // cfg.S), -(-W // cfg.S), cfg.cand_slots),
                        jnp.int32) + (st.y[0].astype(jnp.int32) % 2)
                if "assign" not in skip:
                    a_new, _ = pipeline.run_assign_kernel(
                        p3_subs[rem], fp3_subs[rem], a_subs[rem], st, cand,
                        cfg, coef, rem, stride, lsc_cent)
                else:
                    # synthetic assignment that still depends on the state
                    a_new = a_grid + (jnp.abs(cand[0, 0, 0]) % 2)
                a_subs[rem] = a_new
                a_upd = jnp.where(vrows[rem], a_new[:Hs, :W], UNASSIGNED)
                if "update" not in skip:
                    counts, sums = pipeline.update_accumulate_presliced(
                        p_subs[rem], a_upd, cfg, rem, stride, None)
                    st = pipeline.update_apply_means_rows(counts, sums, st,
                                                          cfg)
                if "after" not in skip:
                    lsc_cent = lsc_ops.after_update(
                        lsc_feats, lsc_w, st, lsc_cent, cfg, rem, stride,
                        None, None, assignment_sub=a_upd[:n_reals[rem]],
                        pixel_mask_sub=None)
                acc = acc + jnp.sum(a_new[0, :8])
            return acc, st.y, (lsc_cent if "after" not in skip else acc)
        return fn

    t_full = timeit(make_loop(()), st2, lsc_cent0)
    print(f"loop body x{N} FULL       : {t_full:7.2f} ms "
          f"({t_full / N:5.2f} /iter)", flush=True)
    for skip, label in ((("after",), "no after_update"),
                        (("assign",), "no assign kernel"),
                        (("cand", "assign"), "no cand+assign"),
                        (("update",), "no update"),
                        (("after", "update"), "no after+update")):
        t = timeit(make_loop(skip), st2, lsc_cent0)
        print(f"loop body x{N} {label:15s}: {t:7.2f} ms  "
              f"(marginal {(t_full - t) / N:+6.2f} /iter)", flush=True)


if __name__ == "__main__":
    main()
