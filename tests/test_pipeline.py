"""End-to-end iterate parity: XLA pipeline vs the exact numpy oracle.

Integer variants must match bit-for-bit; float variants run the identical
op sequence so they are also expected exact on CPU; LSC is tolerance-based
(transcendental functions differ between XLA and numpy by ulps).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fast_slic_tpu import cluster as cl
from fast_slic_tpu.config import (
    StaticConfig, RuntimeParams,
    VARIANT_STANDARD, VARIANT_REAL, VARIANT_REAL_L2, VARIANT_REAL_NOQ,
    VARIANT_LSC,
)
from fast_slic_tpu import pipeline
from fast_slic_tpu.oracle import numpy_ref as oracle


def run_jax(image, st, cfg, params):
    fn = pipeline.compiled_iterate(cfg, params.max_iter,
                                   params.subsample_stride)
    scalars = pipeline.derive_scalars(
        cfg, params.compactness, params.min_size_factor,
        params.preemptive_thres)
    out = fn(image, jax.tree.map(jnp.asarray, st), scalars)
    labels = np.asarray(out.labels)
    if bool(np.asarray(out.cca_tie)):
        # product behavior (runner.py): host CCA on boundary-area ties
        from fast_slic_tpu import native
        assert native.available()
        labels = native.enforce_connectivity_native(
            np.asarray(out.raw_assignment), cfg.K, int(scalars.thres)
        ).astype(np.int64)
    return labels, jax.tree.map(np.asarray, out.clusters)


def agreement(a, b):
    return float((a == b).mean())


CASES = [
    (VARIANT_STANDARD, dict(convert_to_lab=True)),
    (VARIANT_STANDARD, dict(convert_to_lab=False)),
    (VARIANT_STANDARD, dict(manhattan_spatial_dist=False)),
    (VARIANT_REAL, dict(convert_to_lab=True)),
    (VARIANT_REAL_L2, dict(convert_to_lab=True)),
    (VARIANT_REAL_NOQ, dict(convert_to_lab=True)),
    (VARIANT_REAL_NOQ, dict(manhattan_spatial_dist=False)),
]


@pytest.mark.parametrize("variant,flags", CASES)
def test_iterate_matches_oracle(image_factory, variant, flags):
    H, W, K = 48, 64, 12
    image = image_factory(H, W)
    cfg = StaticConfig(H=H, W=W, K=K, variant=variant, **flags)
    params = RuntimeParams(compactness=10.0, min_size_factor=0.1,
                           subsample_stride=3, max_iter=4)
    st = cl.initialize_clusters(image, K)

    labels_j, st_j = run_jax(image, st, cfg, params)
    labels_o, st_o = oracle.iterate_oracle(image, st, cfg, params)

    np.testing.assert_array_equal(labels_j, labels_o)
    np.testing.assert_allclose(st_j.y, st_o.y, atol=1e-4)
    np.testing.assert_allclose(st_j.x, st_o.x, atol=1e-4)
    np.testing.assert_array_equal(st_j.num_members, st_o.num_members)


def test_iterate_lsc(image_factory):
    H, W, K = 48, 64, 12
    image = image_factory(H, W)
    cfg = StaticConfig(H=H, W=W, K=K, variant=VARIANT_LSC)
    params = RuntimeParams(compactness=10.0, min_size_factor=0.1,
                           subsample_stride=3, max_iter=4)
    st = cl.initialize_clusters(image, K)
    labels_j, _ = run_jax(image, st, cfg, params)
    labels_o, _ = oracle.iterate_oracle(image, st, cfg, params)
    assert agreement(labels_j, labels_o) > 0.97


def test_min_size_zero_keeps_components(image_factory):
    H, W, K = 40, 40, 9
    image = image_factory(H, W)
    cfg = StaticConfig(H=H, W=W, K=K)
    params = RuntimeParams(min_size_factor=0.0, max_iter=3)
    st = cl.initialize_clusters(image, K)
    labels_j, _ = run_jax(image, st, cfg, params)
    labels_o, _ = oracle.iterate_oracle(image, st, cfg, params)
    np.testing.assert_array_equal(labels_j, labels_o)


def test_stride_one(image_factory):
    H, W, K = 32, 48, 8
    image = image_factory(H, W)
    cfg = StaticConfig(H=H, W=W, K=K)
    params = RuntimeParams(subsample_stride=1, max_iter=2)
    st = cl.initialize_clusters(image, K)
    labels_j, _ = run_jax(image, st, cfg, params)
    labels_o, _ = oracle.iterate_oracle(image, st, cfg, params)
    np.testing.assert_array_equal(labels_j, labels_o)


def test_labels_cover_and_bounded(image_factory):
    H, W, K = 60, 60, 16
    image = image_factory(H, W)
    cfg = StaticConfig(H=H, W=W, K=K)
    st = cl.initialize_clusters(image, K)
    labels, _ = run_jax(image, st, cfg, RuntimeParams(max_iter=5))
    assert labels.min() >= 0
    assert labels.max() < K


@pytest.mark.parametrize("variant,flags", [
    (VARIANT_STANDARD, dict()),
    (VARIANT_STANDARD, dict(preemptive=True)),
    (VARIANT_REAL, dict()),
    (VARIANT_LSC, dict()),
])
def test_subresident_loop_matches_scan(image_factory, variant, flags,
                                       monkeypatch):
    """The resident-subsampled loop (pipeline._stage_loop_subresident, the
    TPU fast path) is bit-identical to the plain scan loop: same kernels,
    no full-resolution scatter-back per iteration."""
    H, W, K = 48, 64, 12
    image = image_factory(H, W)
    cfg = StaticConfig(H=H, W=W, K=K, variant=variant, arch="pallas",
                       **flags)
    params = RuntimeParams(min_size_factor=0.1, max_iter=4)
    st = cl.initialize_clusters(image, K)
    scalars = pipeline.derive_scalars(cfg, params.compactness,
                                      params.min_size_factor,
                                      params.preemptive_thres)
    img_d = jnp.asarray(image)
    st_d = jax.tree.map(jnp.asarray, st)

    def run():
        out = jax.jit(lambda i, s: pipeline.iterate_graph(
            i, s, cfg, scalars, params.max_iter, 3))(img_d, st_d)
        return (np.asarray(out.labels), np.asarray(out.raw_assignment),
                jax.tree.map(np.asarray, out.clusters))

    monkeypatch.setattr(pipeline, "_FORCE_UNROLL", False)
    labels_scan, raw_scan, st_scan = run()
    monkeypatch.setattr(pipeline, "_FORCE_UNROLL", True)
    labels_sub, raw_sub, st_sub = run()

    np.testing.assert_array_equal(raw_sub, raw_scan)
    np.testing.assert_array_equal(labels_sub, labels_scan)
    for a, b in zip(jax.tree.leaves(st_sub), jax.tree.leaves(st_scan)):
        np.testing.assert_array_equal(a, b)
