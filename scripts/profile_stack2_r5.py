"""Stacked-pipeline stage anatomy: prefix-composed marginals at B=8/32.

The first stack-vs-map A/B showed the stacked NON-LOOP stages scaling
super-linearly (~11 + 0.8*B ms/frame).  This isolates which stage: setup
(LAB+seed), kernel pads, the loop, full_assign, CCA — by timing prefix
programs and reading successive deltas.  Honest sync per NOTES.md traps.
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
from fast_slic_tpu.parallel import stack as sl

H, W, K = 720, 1280, 1600
STRIDE = 3


def probe():
    t0 = time.perf_counter()
    np.asarray(jnp.sum(jnp.ones((128, 128), jnp.float32)))
    return (time.perf_counter() - t0) * 1e3


def frames_of(B):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize(
        (W + 256, H + 256), Image.BILINEAR))
    return np.stack([
        np.ascontiguousarray(img[(7 * b) % 256:(7 * b) % 256 + H,
                                 (11 * b) % 256:(11 * b) % 256 + W])
        for b in range(B)])


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


def build_prefix(stage, cfg, sc, B, mi=10):
    """Prefix graphs of iterate_graph_stacked, refactored inline."""
    def fn(images, st):
        planes, st2 = sl.stage_setup_stacked(images, st, cfg)
        if stage == "setup":
            return st2.y, planes[:, :, ::97, ::97]
        p3_full = sl._pad_frames(planes, cfg)
        BHp, Wp = p3_full.shape[1], p3_full.shape[2]
        Hp = BHp // B
        Hs = -(-H // STRIDE)
        pad = Hs * STRIDE - H
        p3_subs, p_subs, valid_rows = [], [], []
        pv = jnp.concatenate(
            [planes, jnp.zeros((3, B, pad, W), planes.dtype)], axis=2
        ).reshape(3, B, Hs, STRIDE, W)
        for rem in range(STRIDE):
            sub, _ = pipeline._subsample_stack(
                p3_full.reshape(3 * B, Hp, Wp), Hp, H, STRIDE, rem, 0)
            Hsp = sub.shape[1]
            p3_subs.append(sub.reshape(3, B * Hsp, Wp))
            p_subs.append(pv[:, :, :, rem])
            abs_r = np.arange(Hs) * STRIDE + rem
            valid_rows.append(jnp.asarray((abs_r < H)[None, :, None]))
        Hsp = p3_subs[0].shape[1] // B
        if stage == "pads":
            return (st2.y, p3_full[::511, ::127],
                    *[p[::511, ::127] for p in p3_subs])
        st3 = st2
        coef = jnp.asarray(sc.coef, jnp.float32)
        a_subs = [jnp.full((B * Hsp, Wp), UNASSIGNED, jnp.int32)
                  for _ in range(STRIDE)]
        for i in range(mi):
            rem = i % STRIDE
            st3 = pipeline._clamp_centers(st3, cfg)
            cand, cov = sl.build_candidates_batched(st3.y, st3.x,
                                                    st3.is_active, cfg)
            a_new = sl.run_assign_kernel_stacked(
                p3_subs[rem], a_subs[rem], st3, cand, cfg, coef, rem,
                STRIDE, B)
            a_subs[rem] = a_new
            a3 = a_new.reshape(B, Hsp, Wp)[:, :Hs, :W]
            a_upd = jnp.where(valid_rows[rem], a3, UNASSIGNED)
            counts, sums = sl.update_accumulate_stacked(
                p_subs[rem], a_upd, cfg, rem, STRIDE, None)
            st3 = pipeline.update_apply_means_rows(counts, sums, st3, cfg)
        if stage == "loop":
            return st3.y, *[a[::511, ::127] for a in a_subs]
        full = jnp.stack(
            [a_subs[r].reshape(B, Hsp, Wp)[:, :Hs, :W]
             for r in range(STRIDE)], axis=2)
        assignment = full.reshape(B, Hs * STRIDE, W)[:, :H]
        from fast_slic_tpu.cluster import Clusters
        st4 = Clusters(y=st3.y, x=st3.x, r=st3.r, g=st3.g, b=st3.b,
                       num_members=st3.num_members,
                       is_active=jnp.ones([B, K], jnp.int32),
                       is_updatable=st3.is_updatable)
        st4 = pipeline._clamp_centers(st4, cfg)
        cand, cov = sl.build_candidates_batched(st4.y, st4.x,
                                                st4.is_active, cfg)
        old_p = jnp.full((B, Hp, Wp), UNASSIGNED, jnp.int32
                         ).at[:, :H, :W].set(assignment).reshape(B * Hp, Wp)
        a_full = sl.run_assign_kernel_stacked(p3_full, old_p, st4, cand,
                                              cfg, coef, 0, 1, B)
        assignment = a_full.reshape(B, Hp, Wp)[:, :H, :W]
        if stage == "full":
            return st4.y, assignment[:, ::97, ::97]
        from fast_slic_tpu.ops.cca import enforce_connectivity_canvas_flagged
        offs = (jnp.arange(B, dtype=jnp.int32) * K)[:, None, None]
        a_glob = jnp.where(assignment != UNASSIGNED, assignment + offs,
                           UNASSIGNED).reshape(B * H, W)
        labels, tie = enforce_connectivity_canvas_flagged(
            a_glob, K, B, H, H, jnp.asarray(sc.thres, jnp.int32),
            cfg.effective_max_components, cfg.S)
        return labels[::97, ::97], tie
    return fn


def main():
    print(f"probe {probe():.1f} ms", flush=True)
    for B in (32, 8):
        frames = jnp.asarray(frames_of(B))
        sts = [cl.initialize_clusters(f, K) for f in np.asarray(frames)]
        st_b = jax.tree.map(jnp.asarray,
                            jax.tree.map(lambda *xs: jnp.stack(xs), *sts))
        cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
        sc = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
        prev = 0.0
        for stage in ("setup", "pads", "loop", "full", "cca"):
            t = timeit(build_prefix(stage, cfg, sc, B), (frames, st_b),
                       reps=8)
            print(f"B={B:3d} upto {stage:6s}: {t:8.1f} ms total  "
                  f"{t / B:7.2f} ms/frame  (+{(t - prev) / B:6.2f})",
                  flush=True)
            prev = t
        print(f"probe {probe():.1f} ms", flush=True)


if __name__ == "__main__":
    main()
