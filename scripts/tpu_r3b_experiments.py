"""Round-3b TPU experiment battery (run when the axon tunnel is healthy).

Measures, on the REAL subresident loop (the production program):
  1. occ-skip A/B on the assign kernels (FSTPU_OCC_OFF)
  2. CCA propagation strip 64 vs 96 (2-phase cover theorem)
  3. the serial-region dispatch floor ([K]-op chains)
  4. itemized subresident-loop marginals (what exactly costs 5 ms)

Sync per NOTES.md traps: on-device scalar reduce + np.asarray.
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


def photo(H, W, seed=0):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize((W + 512, H + 512),
                                                        Image.BILINEAR))
    off = (16 * seed) % 512
    off2 = (80 * seed + 128) % 512
    return np.ascontiguousarray(img[off:off + H, off2:off2 + W])


def run_batch(H, W, K):
    from fast_slic_tpu.parallel.batch import BatchedSlic
    B = int(os.environ.get("FSTPU_EXP_B", "16"))
    frames = np.stack([photo(H, W, seed=s + 1) for s in range(B)])
    for mode in ("map", "canvas"):
        try:
            bs = BatchedSlic(num_components=K, compactness=10.0,
                             min_size_factor=0.1, batch_mode=mode,
                             check_exactness=False)
            lb = bs.iterate(jnp.asarray(frames), max_iter=10)
            np.asarray(jnp.sum(lb))
            t0 = time.perf_counter()
            for _ in range(8):
                bs._state = None
                lb = bs.iterate(jnp.asarray(frames), max_iter=10)
            np.asarray(jnp.sum(lb))
            dt = (time.perf_counter() - t0) / 8 / B * 1e3
            print(f"batched[{mode}] B={B}: {dt:6.2f} ms/frame "
                  f"({B * H * W / (dt * B) / 1e3:.1f} Mpix/s)",
                  flush=True)
        except Exception as e:
            print(f"batched[{mode}] failed: {str(e)[:140]}", flush=True)


def main():
    H, W, K = 720, 1280, 1600
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    image = photo(H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    img_dev = jnp.asarray(image)

    # ---- 0. full pipeline, production program
    def full(image, st_):
        out = pipeline.iterate_graph(image, st_, cfg, scal, 10, 3)
        return out.labels, out.clusters.y
    t_full = timeit(full, img_dev, st)
    print(f"full iterate (subresident): {t_full:7.2f} ms", flush=True)
    only = os.environ.get("FSTPU_EXP_ONLY")
    if only == "full":
        return
    if only == "batch":
        run_batch(H, W, K)
        return

    # ---- 0b. A/B: smaller candidate slot count (netsort A/B removed after
    # the round-3 measurement: delta was noise; the round-4 scatter-side
    # build has no per-cell capacity — only cand_slots remains)
    cfg_p3 = StaticConfig(H=H, W=W, K=K, arch="pallas", cand_slots=12)
    def full_p3(image, st_):
        out = pipeline.iterate_graph(image, st_, cfg_p3, scal, 10, 3)
        return out.labels, out.clusters.y, out.cand_overflow
    try:
        t_p3 = timeit(full_p3, img_dev, st)
        ovf = bool(np.asarray(jax.jit(full_p3)(img_dev, st)[2]))
        print(f"full iterate cand_slots=12: {t_p3:7.2f} ms "
              f"(delta {t_p3 - t_full:+6.2f}, overflow={ovf})", flush=True)
    except Exception as e:
        print("cand_slots=12 failed:", str(e)[:120], flush=True)

    # ---- 0c. batched: lax.map vs canvas (per-frame numbering CCA)
    if os.environ.get("FSTPU_EXP_BATCH"):
        run_batch(H, W, K)

    # ---- 1. serial floor: chained [K]-op blocks
    def kops(nblocks):
        def fn(v):
            for i in range(nblocks):
                v = jnp.clip(v * 1.000001 + 0.5, 0.0, 1e6)
                v = jnp.where(v > 2.0, v - 1.0, v)
                m = jnp.max(v)
                v = v + m * 1e-9
            return v
        return fn
    v0 = jnp.arange(K, dtype=jnp.float32)
    t10 = timeit(kops(10), v0, n=60)
    t80 = timeit(kops(80), v0, n=60)
    print(f"[K]-op blocks: 10 -> {t10:6.3f} ms, 80 -> {t80:6.3f} ms, "
          f"per-block {(t80 - t10) / 70 * 1e3:6.1f} us", flush=True)

    # data-movement floor: chains of [K] slices / stacks / transposes
    def movement(nblocks):
        def fn(v):
            m = jnp.stack([v, v + 1, v + 2], 0)        # [3, K]
            out = jnp.float32(0)
            for i in range(nblocks):
                a = m[1, :]                            # slice row
                b = jnp.stack([a, a * 1.0000001], 1)   # [K, 2]
                c = jnp.transpose(b)                   # [2, K]
                s = jnp.sum(c)
                m = m + s * 1e-20
                out = out + s
            return out
        return fn
    m10 = timeit(movement(10), v0, n=60)
    m40 = timeit(movement(40), v0, n=60)
    print(f"[K] slice/stack/transpose blocks: 10 -> {m10:6.3f} ms, "
          f"40 -> {m40:6.3f} ms, per-block {(m40 - m10) / 30 * 1e3:6.1f} us",
          flush=True)

    # the [GH, GW, 9P] visit-key sort and a [K]-pair sort, isolated chains
    def sorts(nblocks, shape):
        def fn(v):
            x = (v[:1] * 0).astype(jnp.int32) + jax.lax.broadcasted_iota(
                jnp.int32, shape, len(shape) - 1)
            out = jnp.int32(0)
            for i in range(nblocks):
                x = jax.lax.sort(x ^ (out & 1), dimension=-1)
                out = out + jnp.max(x)
            return out
        return fn
    s1 = timeit(sorts(2, (30, 54, 36)), v0, n=40)
    s2 = timeit(sorts(12, (30, 54, 36)), v0, n=40)
    print(f"[30,54,36] sort: per-op {(s2 - s1) / 10 * 1e3:6.1f} us",
          flush=True)
    k1 = timeit(sorts(2, (1600,)), v0, n=40)
    k2 = timeit(sorts(12, (1600,)), v0, n=40)
    print(f"[1600] sort: per-op {(k2 - k1) / 10 * 1e3:6.1f} us", flush=True)

    # ---- 2. CCA propagation strip A/B on a REAL full assignment
    def get_assignment(image, st_):
        out = pipeline.iterate_graph(image, st_, cfg, scal, 10, 3)
        return out.raw_assignment
    assignment = jnp.asarray(np.asarray(jax.jit(get_assignment)(img_dev, st)))
    from fast_slic_tpu.pallas import cca_tpu
    from fast_slic_tpu.ops import cca as cca_mod
    reach = cca_mod._slic_reach((H, W), cfg.S)
    for strip in (64, 96, 144, 192):
        try:
            t = timeit(lambda a, _s=strip: cca_tpu.connected_components_pallas(
                a, strip=_s, reach=reach), assignment, n=30)
            print(f"cc strip={strip}: {t:7.2f} ms", flush=True)
        except Exception as e:
            print(f"cc strip={strip}: FAILED {str(e)[:120]}", flush=True)
    # exactness cross-check 64 vs 96
    a64 = np.asarray(jax.jit(lambda a: cca_tpu.connected_components_pallas(
        a, strip=64, reach=reach))(assignment))
    a96 = np.asarray(jax.jit(lambda a: cca_tpu.connected_components_pallas(
        a, strip=96, reach=reach))(assignment))
    print("cc 64 vs 96 identical:", bool((a64 == a96).all()), flush=True)

    # ---- 3. subresident loop itemized (the REAL loop path)
    planes_fn = jax.jit(lambda im, s: pipeline.stage_setup(im, s, cfg, scal))

    def loop_only(image, st_):
        planes, st2, lsc_state = pipeline.stage_setup(image, st_, cfg, scal)
        st3, assignment, _, cov, _ = pipeline.stage_loop(
            planes, st2, lsc_state, cfg, scal, 10, 3)
        return assignment, st3.y
    t_setup = timeit(lambda im, s: pipeline.stage_setup(im, s, cfg, scal)[0],
                     img_dev, st)
    t_loop = timeit(loop_only, img_dev, st)
    print(f"setup(lab) {t_setup:6.2f} ms; setup+loop {t_loop:6.2f} "
          f"(marginal loop {t_loop - t_setup:6.2f})", flush=True)

    # loop with pieces disabled (edit _stage_loop_subresident knobs via env)
    # -> approximate per-piece costs by monkeypatching
    import fast_slic_tpu.pipeline as P

    real_bc = P.build_candidates
    def loop_fixed_cand(image, st_):
        planes, st2, lsc_state = pipeline.stage_setup(image, st_, cfg, scal)
        cand0, ov = real_bc(st2.y, st2.x, st2.is_active, cfg)
        P.build_candidates = lambda *a, **k: (cand0, ov)
        try:
            st3, assignment, _, cov, _ = pipeline.stage_loop(
                planes, st2, lsc_state, cfg, scal, 10, 3)
        finally:
            P.build_candidates = real_bc
        return assignment, st3.y
    t_fc = timeit(loop_fixed_cand, img_dev, st)
    print(f"loop w/ frozen candidates: {t_fc:6.2f} "
          f"(candidates+fields marginal {t_loop - t_fc:6.2f})", flush=True)

    # ---- 3b. candidate-build itemization (CSE-proof: each link of the
    # chain perturbs its input by a value-dependent epsilon so XLA cannot
    # fold the 10 builds into one)
    def chain(fn10):
        def f(y, x, act):
            out = jnp.float32(0)
            yy, xx = y, x
            for i in range(10):
                r = fn10(yy, xx, act)
                s = sum(jnp.sum(v.astype(jnp.float32)) for v in
                        jax.tree.leaves(r))
                yy = yy + s * 1e-20 + 1e-6
                xx = xx + s * 1e-20
                out = out + s
            return out
        return f

    def bc_full(y, x, act):
        cand, ov = real_bc(y, x, act, cfg)
        return cand, ov

    def bc_sortonly(y, x, act):
        cell = (jnp.clip(y.astype(jnp.int32) // cfg.S, 0, 29) * 54
                + jnp.clip(x.astype(jnp.int32) // cfg.S, 0, 53))
        order = jnp.argsort(cell, stable=True).astype(jnp.int32)
        return (order,)

    def bc_fields(y, x, act):
        cand, ov = real_bc(y, x, act, cfg)
        from fast_slic_tpu.pallas.assign_tpu import prepare_cell_fields
        table = jnp.stack([y, x, y * 0 + 1, x * 0 + 2, y * 0 + 3], axis=1)
        return prepare_cell_fields(cand, table)

    t_empty = timeit(chain(lambda y, x, act: (y,)), st.y, st.x,
                     st.is_active, n=30)
    t_sort = timeit(chain(bc_sortonly), st.y, st.x, st.is_active, n=30)
    t_bc = timeit(chain(bc_full), st.y, st.x, st.is_active, n=30)
    t_bf = timeit(chain(bc_fields), st.y, st.x, st.is_active, n=30)
    print(f"10x chain: empty {t_empty:6.2f}  argsort-only {t_sort:6.2f}  "
          f"build_candidates {t_bc:6.2f}  +fields {t_bf:6.2f} ms",
          flush=True)

    real_apply = P.update_apply_means_rows
    def loop_no_apply(image, st_):
        planes, st2, lsc_state = pipeline.stage_setup(image, st_, cfg, scal)
        P.update_apply_means_rows = lambda c, s, st4, cfg2: st4
        try:
            st3, assignment, _, cov, _ = pipeline.stage_loop(
                planes, st2, lsc_state, cfg, scal, 10, 3)
        finally:
            P.update_apply_means_rows = real_apply
        return assignment, st3.y
    t_na = timeit(loop_no_apply, img_dev, st)
    print(f"loop w/o apply_means: {t_na:6.2f} "
          f"(apply_means marginal {t_loop - t_na:6.2f})", flush=True)


if __name__ == "__main__":
    main()
