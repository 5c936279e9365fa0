"""Round-4 CRF wall-time itemization (VERDICT #7: cfg5 <= 25 ms target).

Measures, in one process on a probed-healthy tunnel:
  * the steady-state streaming cycle wall (initialize + inference(5)),
    synced once at the end — the bench_config5 pattern,
  * the per-cycle wall with a BLOCKED sync each cycle (exposes the real
    per-dispatch round-trip),
  * the energy-staging program alone and the mean-field program alone
    (device compute attribution for the round-4 split),
  * the first-call cost (energy staging + meanfield) for a fresh graph —
    the per-new-frame price a streaming video consumer pays.

Sync trap (NOTES.md): syncs by an on-device reduce to a scalar.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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
    from fast_slic_tpu.crf import SimpleCRF
    from fast_slic_tpu import Slic
    from fast_slic_tpu.models import crf as crf_mod

    print(f"probe: {probe():.1f} ms (healthy ~28-40)", flush=True)

    K, C, T = 1600, 21, 5
    crf = SimpleCRF(C, K)
    s = Slic(num_components=K, min_size_factor=0.1)
    for t in range(T):
        img = photo(720, 1280, seed=t)
        s.iterate(img)
        f = crf.push_slic_frame(s)
        rngl = np.random.default_rng(t)
        f.set_proba(np.ascontiguousarray(
            rngl.dirichlet(np.ones(C), K).T.astype(np.float32)))

    # warm compile + settle
    crf.initialize()
    crf.inference(5)
    np.asarray(jnp.sum(crf.inferred_stack()))

    # 1. bench_config5 pattern: queued cycles, one sync
    for reps in (5, 20):
        t0 = time.perf_counter()
        for _ in range(reps):
            crf.initialize()
            crf.inference(5)
        np.asarray(jnp.sum(crf.inferred_stack()))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"streaming cycle (reps={reps:2d}, 1 sync): {dt:7.2f} ms",
              flush=True)

    # 2. blocked per-cycle (the real per-dispatch round-trip exposed)
    t0 = time.perf_counter()
    for _ in range(5):
        crf.initialize()
        crf.inference(5)
        np.asarray(jnp.sum(crf.inferred_stack()))
    print(f"blocked cycle            : {(time.perf_counter()-t0)/5*1e3:7.2f}"
          " ms", flush=True)

    # 3. device-compute attribution: chain the meanfield program 20x
    frames = list(crf._frames.values())
    nbr_d, yxmrgb_d, unaries_d = crf._cache
    _, _, W_d, wp_d, wn_d = crf._energy_cache
    compat_key = tuple(float(v) for v in crf.compat_by_class)
    fn = crf_mod._compiled_meanfield(T, C, K, True, compat_key, 5)

    @jax.jit
    def mf_chain(unaries, W, wp, wn):
        acc = jnp.zeros((), jnp.float32)
        u = unaries
        for i in range(20):
            q = fn(u, W, wp, wn)
            acc = acc + jnp.sum(q)
            u = unaries + acc * 1e-20
        return acc
    r = mf_chain(unaries_d, W_d, wp_d, wn_d)
    np.asarray(r)
    t0 = time.perf_counter()
    r = mf_chain(unaries_d + 1e-9, W_d, wp_d, wn_d)
    np.asarray(r)
    print(f"meanfield device compute : {(time.perf_counter()-t0)/20*1e3:7.2f}"
          " ms/call (20x chained)", flush=True)

    params_key = tuple(float(v) for v in crf.params.as_array())
    efn = crf_mod._compiled_energies(T, K, int(nbr_d.shape[-1]), params_key)

    @jax.jit
    def en_chain(yxmrgb, nbr):
        acc = jnp.zeros((), jnp.float32)
        y = yxmrgb
        for i in range(10):
            W, wp, wn = efn(y, nbr)
            acc = acc + jnp.sum(W) + jnp.sum(wp)
            y = yxmrgb + acc * 1e-20
        return acc
    r = en_chain(yxmrgb_d, nbr_d)
    np.asarray(r)
    t0 = time.perf_counter()
    r = en_chain(yxmrgb_d + 1e-9, nbr_d)
    np.asarray(r)
    print(f"energy staging compute   : {(time.perf_counter()-t0)/10*1e3:7.2f}"
          " ms/call (10x chained)", flush=True)

    # 4. fresh-graph first call (energy restage + meanfield, 2 dispatches)
    t0 = time.perf_counter()
    crf._energy_cache = None
    crf.initialize()
    crf.inference(5)
    np.asarray(jnp.sum(crf.inferred_stack()))
    print(f"fresh-graph cycle        : {(time.perf_counter()-t0)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
