"""Bisect the batched-canvas pipeline cost on TPU."""
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
from fast_slic_tpu.parallel import canvas as canvas_lib


def timeit(fn, *args, n=10, warmup=2):
    outs = [fn(*args) for _ in range(warmup)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def photo(H, W):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    return np.asarray(Image.fromarray(z["image"]).resize((W, H),
                                                         Image.BILINEAR))


def main():
    B, H, W, K = 4, 720, 1280, 1600
    cfg = canvas_lib.make_canvas_config(B, H, W, K, 3, arch="pallas")
    pitch, CH = cfg.canvas_pitch, cfg.H
    print(f"canvas: B={B} pitch={pitch} CH={CH} K={cfg.K} S={cfg.S} "
          f"maxc={cfg.effective_max_components}")
    imgs = np.stack([photo(H, W) for _ in range(B)])
    cv = canvas_lib.build_canvas_images(imgs, pitch)
    states = [cl.initialize_clusters(img, K) for img in imgs]
    st_bk = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    st = canvas_lib.stack_cluster_state(st_bk, pitch)
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    cv_dev = jnp.asarray(cv)

    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_pallas
    t = timeit(jax.jit(rgb_to_lab_pallas), cv_dev)
    print(f"lab          : {t:8.2f} ms")
    planes = jnp.asarray(np.asarray(jax.jit(rgb_to_lab_pallas)(cv_dev)))

    bc = jax.jit(lambda y, x, a: pipeline.build_candidates(y, x, a, cfg))
    t = timeit(bc, st.y, st.x, st.is_active)
    print(f"build_cand   : {t:8.2f} ms")
    cand = jnp.asarray(np.asarray(bc(st.y, st.x, st.is_active)[0]))

    from fast_slic_tpu.pallas.assign_tpu import prepare_cell_fields
    table = jnp.stack([st.y, st.x, st.r, st.g, st.b], axis=1)
    pcf = jax.jit(lambda c, t_: prepare_cell_fields(c, t_))
    t = timeit(pcf, cand, table)
    print(f"prep_fields  : {t:8.2f} ms")

    p3 = jnp.asarray(np.asarray(
        jax.jit(lambda p: pipeline._pad_planes_for_pallas(p, cfg))(planes)))
    old = jnp.full([CH, W], UNASSIGNED, jnp.int32)
    f = jax.jit(lambda pl_, p3_, old_: pipeline.assign_dispatch(
        pl_, p3_, st, cand, cfg, scal.coef, old_, 0, 3).assignment)
    t = timeit(f, planes, p3, old)
    print(f"assign s3    : {t:8.2f} ms")
    f1 = jax.jit(lambda pl_, p3_, old_: pipeline.assign_dispatch(
        pl_, p3_, st, cand, cfg, scal.coef, old_, 0, 1).assignment)
    t = timeit(f1, planes, p3, old)
    print(f"assign s1    : {t:8.2f} ms")
    assignment = jnp.asarray(np.asarray(f1(planes, p3, old)))

    f = jax.jit(lambda pl_, a: pipeline.update_xla(pl_, a, st, cfg, 0, 3).y)
    t = timeit(f, planes, assignment)
    print(f"update s3    : {t:8.2f} ms")

    from fast_slic_tpu.ops import cca as cca_mod
    f = jax.jit(lambda a: cca_mod.connected_components(a, cfg.S))
    t = timeit(f, assignment, n=5)
    print(f"cc           : {t:8.2f} ms")

    f = jax.jit(lambda a: cca_mod.enforce_connectivity_canvas_flagged(
        a, K, B, pitch, H, jnp.int32(int(scal.thres)),
        cfg.frame_max_components, cfg.S)[0])
    t = timeit(f, assignment, n=5)
    print(f"cca canvas   : {t:8.2f} ms")


if __name__ == "__main__":
    main()
