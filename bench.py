#!/usr/bin/env python
"""Benchmark: 1280x720, K=1600, 10 iterations — Mpix/s per chip.

Prints ONE json line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is relative to the reference CPU implementation's best published
throughput: 640x480 @ 8.8 ms on a 6C12T CPU ~= 34.9 Mpix/s
(BASELINE.md; /root/reference/README.md:68).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_image(H, W, seed=0):
    """Real-photo content (the repo's pinned test photograph, bilinearly
    resized): natural images are what the CCA component-count sizing and
    the no-host-fallback assertion below are calibrated for.  Synthetic
    block-noise images fragment into thousands of EQUAL-AREA blobs, which
    trips the bit-parity tie flag and would silently measure a pipeline
    whose output needs a host CCA re-run."""
    here = os.path.dirname(os.path.abspath(__file__))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    return np.asarray(Image.fromarray(z["image"]).resize((W, H),
                                                         Image.BILINEAR))


def main():
    import jax
    import jax.numpy as jnp
    from fast_slic_tpu import cluster as cl
    from fast_slic_tpu.config import StaticConfig, RuntimeParams
    from fast_slic_tpu import pipeline

    H, W, K = 720, 1280, 1600
    max_iter, stride = 10, 3
    arch = os.environ.get("FSTPU_BENCH_ARCH", "pallas")
    try:
        cfg = StaticConfig(H=H, W=W, K=K, arch=arch, convert_to_lab=True)
    except NotImplementedError:
        cfg = StaticConfig(H=H, W=W, K=K, arch="xla", convert_to_lab=True)
    params = RuntimeParams(compactness=10.0, min_size_factor=0.1,
                           subsample_stride=stride, max_iter=max_iter)

    image = make_image(H, W)
    st = cl.initialize_clusters(image, K)
    st_dev = jax.tree.map(jnp.asarray, st)
    image_dev = jnp.asarray(image)

    fn = pipeline.compiled_iterate(cfg, max_iter, stride)
    scalars = pipeline.derive_scalars(
        cfg, params.compactness, params.min_size_factor,
        params.preemptive_thres)
    args = (image_dev, st_dev, scalars)

    # warmup + compile
    out = fn(*args)
    jax.block_until_ready(out)
    # the measured program must be END-TO-END correct on its own: no
    # exactness-fallback flag (which would mean the public API re-runs the
    # host CCA and the device-only time would overstate throughput)
    assert not bool(np.asarray(out.cca_tie)), \
        "bench content tripped the host-CCA fallback; number would be dishonest"

    reps = int(os.environ.get("FSTPU_BENCH_REPS", "20"))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    mpix_s = (H * W) / dt / 1e6
    baseline_mpix_s = (640 * 480) / 8.8e-3 / 1e6  # 34.9 Mpix/s (CPU ref)
    print(json.dumps({
        "metric": "Mpix/s per chip (720p, K=1600, 10 iters)",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / baseline_mpix_s, 3),
    }))


if __name__ == "__main__":
    main()
