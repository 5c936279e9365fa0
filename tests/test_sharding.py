"""Multi-device sharding: the batched mesh pipeline must match per-frame
single-device results exactly (conftest provides 8 virtual CPU devices)."""

import numpy as np
import pytest

import jax

from fast_slic_tpu.parallel.batch import BatchedSlic
from fast_slic_tpu.parallel.mesh import make_mesh
from fast_slic_tpu import Slic


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batched_mesh_matches_single(image_factory):
    B, H, W, K = 4, 48, 64, 9
    frames = np.stack([image_factory(H, W) for _ in range(B)])

    mesh = make_mesh(8, data=4, space=2)
    batched = BatchedSlic(num_components=K, compactness=10.0,
                          min_size_factor=0.1, subsample_stride=3, mesh=mesh)
    labels = np.asarray(batched.iterate(frames, max_iter=3))

    for b in range(B):
        single = Slic(num_components=K, compactness=10.0, min_size_factor=0.1,
                      subsample_stride=3)
        ref = single.iterate(frames[b], max_iter=3)
        np.testing.assert_array_equal(labels[b], np.asarray(ref))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batched_warm_start_carries_state(image_factory):
    B, H, W, K = 2, 48, 48, 4
    frames = np.stack([image_factory(H, W) for _ in range(B)])
    mesh = make_mesh(2, data=2, space=1)
    batched = BatchedSlic(num_components=K, mesh=mesh)
    l1 = np.asarray(batched.iterate(frames, max_iter=2))
    l2 = np.asarray(batched.iterate(frames, max_iter=2))
    assert l1.shape == l2.shape == (B, H, W)
    assert l2.min() >= 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_spatial_sharded_matches_single(image_factory):
    from fast_slic_tpu.parallel.spatial import ShardedSlic
    H, W, K = 64, 64, 9
    img = image_factory(H, W)
    mesh = make_mesh(8, data=1, space=8)
    sharded = ShardedSlic(num_components=K, min_size_factor=0.1, mesh=mesh)
    labels = np.asarray(sharded.iterate(img, max_iter=3))
    ref = Slic(num_components=K, min_size_factor=0.1).iterate(img, max_iter=3)
    np.testing.assert_array_equal(labels, np.asarray(ref))


def test_dryrun_entry():
    import importlib
    ge = importlib.import_module("__graft_entry__")
    ge.dryrun_multichip(len(jax.devices()))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gspmd_spatial_preemptive_and_variant(image_factory):
    """ShardedSlic (GSPMD path) accepts variant/preemptive and matches the
    single-device pipeline."""
    from fast_slic_tpu.parallel.spatial import ShardedSlic
    H, W, K = 64, 64, 9
    img = image_factory(H, W)
    mesh = make_mesh(8, data=1, space=8)
    sharded = ShardedSlic(num_components=K, min_size_factor=0.1,
                          preemptive=True, mesh=mesh)
    labels = np.asarray(sharded.iterate(img, max_iter=3))
    assert labels.dtype == np.int16
    ref = Slic(num_components=K, min_size_factor=0.1,
               preemptive=True).iterate(img, max_iter=3)
    np.testing.assert_array_equal(labels, np.asarray(ref))
