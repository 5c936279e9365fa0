"""Round-3 TPU experiment battery (run when the tunnel is healthy):
1. tunnel probe
2. float-kernel HIGH-precision validation (bit-parity vs XLA oracle)
3. headline bench (batched + single, no config matrix)
4. cand_slots 16 vs 14 A/B on the single-frame program
Run: python scripts/tpu_r3_experiments.py [stage...]
"""
import os
import sys
import time
import subprocess

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

stages = sys.argv[1:] or ["probe", "prec", "bench", "slots"]


def probe():
    import jax, jax.numpy as jnp
    import numpy as np
    t0 = time.time()
    r = float(np.asarray(jnp.sum(jnp.arange(1024.0) * 2)))
    dt = time.time() - t0
    print(f"probe: tiny op {dt:.1f}s -> {'HEALTHY' if dt < 60 else 'DEGRADED'}",
          flush=True)
    return dt < 60


def prec():
    rc = subprocess.run([sys.executable, os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "check_float_precision.py")]).returncode
    print("prec:", "OK" if rc == 0 else "FAIL", flush=True)


def bench():
    env = dict(os.environ, FSTPU_BENCH_CONFIGS="0")
    subprocess.run([sys.executable, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py")], env=env)


def slots():
    import numpy as np, jax, jax.numpy as jnp
    from fast_slic_tpu import cluster as cl
    from fast_slic_tpu import pipeline
    from fast_slic_tpu.config import StaticConfig
    H, W, K = 720, 1280, 1600
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    img = np.asarray(Image.fromarray(z["image"]).resize((W + 512, H + 512),
                                                        Image.BILINEAR))
    image = np.ascontiguousarray(img[0:H, 128:128 + W])
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    img_d = jnp.asarray(image)
    for slots_n in (16, 14, 12):
        cfg = StaticConfig(H=H, W=W, K=K, arch="pallas", cand_slots=slots_n)
        scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
        f = jax.jit(lambda i, s: pipeline.iterate_graph(
            i, s, cfg, scal, 10, 3))

        def g(i, s):
            o = f(i, s)
            return jnp.sum(o.labels) + o.cand_overflow
        gj = jax.jit(g)
        for _ in range(3):
            r = gj(img_d, st)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = gj(img_d, st)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 20 * 1e3
        o = f(img_d, st)
        ovf = bool(np.asarray(o.cand_overflow))
        print(f"slots={slots_n}: {dt:.2f} ms  overflow={ovf}", flush=True)


for s in stages:
    if s == "probe" and not probe():
        print("tunnel degraded; aborting", flush=True)
        sys.exit(1)
    elif s == "prec":
        prec()
    elif s == "bench":
        bench()
    elif s == "slots":
        slots()
