"""Instrument the REAL canvas CCA pieces (chunked spacer labels)."""
import os
import sys
import time
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fast_slic_tpu import cluster as cl
from fast_slic_tpu import pipeline
from fast_slic_tpu.config import StaticConfig, UNASSIGNED
from fast_slic_tpu.parallel import canvas as canvas_lib
from fast_slic_tpu.ops import cca as cca_mod
from fast_slic_tpu.pallas.cca_tpu import propagate_min_pallas, _cc_passes


def timeit(fn, *args, n=8, warmup=2):
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


def count_passes(labels, m0, reach, strip=64):
    """Host-looped fixpoint to count kernel passes."""
    H, W = labels.shape
    Hp = -(-H // strip) * strip
    Wp = -(-W // 128) * 128
    lab_p = jnp.full((Hp, Wp), -7, jnp.int32).at[:H, :W].set(labels)
    m_p = jnp.full((Hp, Wp), 0x7FFFFFFF, jnp.int32).at[:H, :W].set(m0)
    passes = 0
    while True:
        m2 = _cc_passes(lab_p, m_p, strip, False, reach)
        passes += 1
        if bool(jnp.all(m2 == m_p)):
            return passes
        m_p = m2


def main():
    B, H, W, K = 4, 720, 1280, 1600
    cfg = canvas_lib.make_canvas_config(B, H, W, K, 3, arch="pallas")
    pitch, CH = cfg.canvas_pitch, cfg.H
    imgs = np.stack([photo(H, W) for _ in range(B)])
    cv = canvas_lib.build_canvas_images(imgs, pitch)
    states = [cl.initialize_clusters(img, K) for img in imgs]
    st_bk = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    st = canvas_lib.stack_cluster_state(st_bk, pitch)
    scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)

    def fa(image, st_):
        planes, st2, lsc = pipeline.stage_setup(image, st_, cfg, scal)
        st3, asg, lc, ovf, _ = pipeline.stage_loop(planes, st2, lsc, cfg,
                                                   scal, 10, 3)
        st4, asg2, md, _ = pipeline.stage_full_assign(planes, st3, lsc, lc,
                                                      asg, cfg, scal)
        return asg2
    assignment = jnp.asarray(np.asarray(jax.jit(fa)(jnp.asarray(cv), st)))

    S = cfg.S
    reach = cca_mod._slic_reach((CH, W), S)
    ii = np.arange(CH)[:, None]
    jjn = np.arange(W)[None, :]
    spacer = (ii % pitch) >= H
    chunk = max(1, reach - 2)
    asg_np = np.asarray(assignment)
    cca_labels = np.where(spacer, 0x10000 + jjn // chunk, asg_np)
    cca_dev = jnp.asarray(cca_labels.astype(np.int32))

    n = CH * W
    iota = (np.arange(n, dtype=np.int64).reshape(CH, W)).astype(np.int32)
    iota_dev = jnp.asarray(iota)

    p_un = count_passes(assignment, iota_dev, reach)
    p_ch = count_passes(cca_dev, iota_dev, reach)
    print(f"cc passes: unassigned-spacers={p_un} chunked={p_ch}")

    for strip in (64, 128, 256):
        t = timeit(lambda a: propagate_min_pallas(a, iota_dev, strip=strip,
                                                  reach=reach), cca_dev)
        print(f"cc chunked strip={strip:3d}: {t:8.2f} ms")

    # seg select chains alone
    maxc = cfg.effective_max_components
    cfv = jnp.asarray((np.arange(maxc) * B // maxc).astype(np.int32))

    @jax.jit
    def chains(v):
        out = jnp.zeros([maxc], jnp.int32)
        tot = []
        for f in range(B):
            tot.append(jnp.sum(jnp.where(cfv == f, v, 0)))
            out = jnp.where(cfv == f, tot[-1], out)
        return out, jnp.stack(tot)

    t = timeit(chains, jnp.ones([maxc], jnp.int32))
    print(f"one B-chain (sum+expand) over maxc={maxc}: {t:8.2f} ms")

    # full canvas cca, current code
    f = jax.jit(lambda a: cca_mod.enforce_connectivity_canvas_flagged(  # maxc arg is now PER-FRAME
        a, K, B, pitch, H, jnp.int32(int(scal.thres)), maxc, S)[0])
    t = timeit(f, assignment, n=5)
    print(f"canvas cca FULL           : {t:8.2f} ms")


if __name__ == "__main__":
    main()
