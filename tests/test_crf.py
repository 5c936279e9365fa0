"""SimpleCRF semantics: lifecycle, unary math, pairwise energies vs
closed-form numpy, and full mean-field inference vs a straight-line numpy
implementation of the reference update (simple-crf.cpp:62-151)."""

import gc

import numpy as np
import pytest

from fast_slic_tpu.crf import SimpleCRF


def test_lifecycle():
    crf = SimpleCRF(3, 100)
    assert crf.space_size == 300
    assert crf.first_time == -1
    assert crf.last_time == -1
    assert crf.num_frames == 0
    with pytest.raises(IndexError):
        crf.get_frame(10)
    assert crf.pop_frame() == -1

    f1 = crf.push_frame()
    assert (crf.num_frames, crf.first_time, crf.last_time) == (1, 0, 0)
    assert f1.space_size == 300 and f1.time == 0
    assert crf.get_frame(0).time == 0
    f2 = crf.push_frame()
    assert (crf.num_frames, crf.first_time, crf.last_time) == (2, 0, 1)
    assert crf.pop_frame() == 0
    assert crf.first_time == crf.last_time == 1
    assert f2.time == 1


def test_frame_outlives_crf():
    crf = SimpleCRF(3, 100)
    frame = crf.push_frame()
    del crf
    gc.collect()
    frame.unaries
    frame.get_inferred()


def test_unary_setters():
    crf = SimpleCRF(3, 3)
    frame = crf.push_frame()

    frame.set_unbiased()
    assert np.allclose(frame.unaries, np.log(3))

    frame.set_mask(np.array([0, 1, 2], np.int32), 0.5)
    expected = -np.log(np.where(np.eye(3, dtype=bool), 2 / 3.0, 1 / 6.0))
    assert np.allclose(frame.unaries, expected, atol=1e-6)

    prob = np.array([[0.7, 0.5, 0.1], [0.1, 0.3, 0.15], [0.2, 0.2, 0.75]],
                    np.float32)
    frame.set_proba(prob)
    assert np.allclose(frame.unaries, -np.log(prob), atol=1e-6)

    assert np.allclose(frame.get_inferred(), 0)
    crf.initialize()
    assert np.allclose(frame.get_inferred(), prob, atol=1e-6)

    frame.set_unbiased()
    frame.reset_inferred()
    assert np.allclose(frame.get_inferred(), 1 / 3.0, atol=1e-6)


def test_yxmrgb_roundtrip_and_connectivity():
    crf = SimpleCRF(3, 3)
    frame = crf.push_frame()
    data = np.array([[1, 2, 1, 3, 4, 5],
                     [6, 7, 2, 8, 9, 10],
                     [11, 12, 3, 13, 14, 15]], np.int32)
    frame.set_yxmrgb(data)
    res = frame.get_yxmrgb()
    assert res == data.tolist()

    assert frame.get_connectivity() == [[], [], []]
    with pytest.raises(TypeError):
        frame.set_connectivity([None, None, None])
    frame.set_connectivity([[0, 1], [2], [0]])
    assert frame.get_connectivity() == [[0, 1], [2], [0]]
    with pytest.raises(ValueError):
        frame.set_connectivity([[0]])


def test_spatial_energy_formula():
    w, srgb, sxy = 1.9, 3.5, 2.4
    crf = SimpleCRF(3, 2)
    crf.spatial_w, crf.spatial_srgb, crf.spatial_sxy = w, srgb, sxy
    assert np.isclose(crf.spatial_w, w)

    frame = crf.push_frame()
    frame.set_yxmrgb(np.array([[1, 1, 1, 1, 2, 6],
                               [0, 0, 1, 4, 5, 3]], np.int32))
    expected = w * np.exp(
        -((1 - 4) ** 2 + (2 - 5) ** 2 + (6 - 3) ** 2) / (2 * srgb ** 2)
        - ((1 - 0) ** 2 + (1 - 0) ** 2) / (2 * sxy ** 2))
    assert np.isclose(frame.spatial_pairwise_energy(0, 1), expected, rtol=1e-5)
    assert np.isclose(frame.spatial_pairwise_energy(1, 0), expected, rtol=1e-5)
    assert frame.spatial_pairwise_energy(0, 0) == 0
    assert frame.spatial_pairwise_energy(1, 1) == 0


def test_temporal_energy_formula():
    w, srgb = 1.9, 3.5
    crf = SimpleCRF(3, 1)
    crf.temporal_w, crf.temporal_srgb = w, srgb
    f1, f2 = crf.push_frame(), crf.push_frame()
    f1.set_yxmrgb(np.array([[0, 0, 1, 1, 2, 6]], np.int32))
    f2.set_yxmrgb(np.array([[0, 0, 1, 4, 5, 3]], np.int32))
    expected = w * np.exp(
        -((1 - 4) ** 2 + (2 - 5) ** 2 + (6 - 3) ** 2) / (2 * srgb ** 2))
    assert np.isclose(f1.temporal_pairwise_energy(0, f2), expected, rtol=1e-5)
    assert np.isclose(f2.temporal_pairwise_energy(0, f1), expected, rtol=1e-5)
    assert f1.temporal_pairwise_energy(0, f1) == 0


def _numpy_infer_once(crf, frames, qs):
    """Straight-line reference of infer_once (simple-crf.cpp:62-151)."""
    T = len(frames)
    C, N = crf.num_classes, crf.num_nodes
    out = []
    for t in range(T):
        f = frames[t]
        m = np.array([row[2] for row in f.get_yxmrgb()])
        messages = np.zeros([C, N])
        for cls in range(C):
            for i in range(N):
                mi = max(m[i], 1)
                msg = 0.0
                for j in f.connected_nodes(i):
                    e = f.spatial_pairwise_energy(j, i)
                    msg += e * qs[t][cls, j] * np.sqrt(m[j] / mi)
                if t > 0:
                    mp = np.array([row[2] for row in frames[t - 1].get_yxmrgb()])
                    e = f.temporal_pairwise_energy(i, frames[t - 1])
                    msg += e * qs[t - 1][cls, i] * np.sqrt(mp[i] / mi)
                if t < T - 1:
                    mn = np.array([row[2] for row in frames[t + 1].get_yxmrgb()])
                    e = f.temporal_pairwise_energy(i, frames[t + 1])
                    msg += e * qs[t + 1][cls, i] * np.sqrt(mn[i] / mi)
                messages[cls, i] = msg
        compat = np.asarray(crf.compat_by_class, np.float64)
        new_q = np.zeros([C, N])
        for cls in range(C):
            for i in range(N):
                gathered = sum(compat[o] * messages[o, i]
                               for o in range(C) if o != cls)
                new_q[cls, i] = np.exp(-(f.unaries[cls, i] + gathered))
        sums = np.maximum(new_q.sum(axis=0), 1e-5)
        out.append(new_q / sums)
    return out


def test_inference_matches_numpy(rng):
    C, N, T = 3, 7, 3
    crf = SimpleCRF(C, N)
    crf.spatial_sxy = 5.0
    frames = []
    for t in range(T):
        f = crf.push_frame()
        yxmrgb = np.concatenate(
            [rng.integers(0, 20, size=(N, 2)),
             rng.integers(1, 9, size=(N, 1)),
             rng.integers(0, 256, size=(N, 3))], axis=1).astype(np.int32)
        f.set_yxmrgb(yxmrgb)
        f.set_connectivity([
            sorted(set(rng.integers(0, N, size=2).tolist()) - {i})
            for i in range(N)])
        proba = rng.random(size=(C, N)).astype(np.float32) + 0.05
        f.set_proba(proba / proba.sum(0))
        frames.append(f)
    crf.initialize()

    qs = [f.get_inferred() for f in frames]
    for _ in range(2):
        qs = _numpy_infer_once(crf, frames, qs)

    crf.inference(2)
    for t, f in enumerate(frames):
        np.testing.assert_allclose(f.get_inferred(), qs[t], rtol=2e-4,
                                   atol=1e-6)


def test_inferred_stack_device_residency(rng):
    """inferred_stack() returns the device [T, C, N] posterior stack after
    inference, matches get_inferred per frame, and goes stale (None) when a
    frame mutates or materializes its q on the host."""
    C, N, T = 3, 5, 2
    crf = SimpleCRF(C, N)
    frames = []
    for t in range(T):
        f = crf.push_frame()
        f.set_connectivity([[j for j in range(N) if j != i][:2]
                            for i in range(N)])
        proba = rng.random(size=(C, N)).astype(np.float32) + 0.05
        f.set_proba(proba / proba.sum(0))
        frames.append(f)
    assert crf.inferred_stack() is None  # nothing inferred yet
    crf.initialize()
    crf.inference(2)
    stack = crf.inferred_stack()
    assert stack is not None and stack.shape == (T, C, N)
    got = np.asarray(stack)
    for t, f in enumerate(frames):
        np.testing.assert_array_equal(got[t], f.get_inferred())
    # get_inferred materialized on host -> the device stack is stale
    assert crf.inferred_stack() is None
