"""Stacked (frame-grid) batch mode: per-frame bit-parity with the
single-frame pipeline.

The stacked mode (parallel/stack.py) runs B frames through ONE batched
program — frame-grid Pallas kernels, [B, K] glue, one B*K-bin segment sum,
one frame-aware CCA pass.  Every per-frame output must be bit-identical to
pipeline.iterate_graph on that frame alone (same cfg, same arch), including
the exactness flags.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_slic_tpu import cluster as cluster_lib
from fast_slic_tpu import pipeline
from fast_slic_tpu.config import StaticConfig
from fast_slic_tpu.parallel.stack import (build_candidates_batched,
                                          iterate_graph_stacked)

B, H, W, K = 3, 96, 128, 24


def _frames(image_factory):
    return np.stack([image_factory(H, W) for _ in range(B)])


def _states(frames):
    sts = [cluster_lib.initialize_clusters(f, K) for f in frames]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *sts)


def _single(frame, st_f, cfg, scalars, max_iter, stride):
    out = pipeline.iterate_graph(jnp.asarray(frame), st_f, cfg, scalars,
                                 max_iter, stride)
    return out


def _run_both(frames, cfg, scalars, max_iter, stride):
    st_b = _states(frames)
    outs = iterate_graph_stacked(jnp.asarray(frames), st_b, cfg, scalars,
                                 max_iter, stride)
    singles = []
    for f in range(B):
        st_f = jax.tree.map(lambda x, f=f: x[f], st_b)
        singles.append(_single(frames[f], st_f, cfg, scalars, max_iter,
                               stride))
    return outs, singles


@pytest.mark.parametrize("variant,stride,preemptive", [
    ("standard", 3, False),
    ("standard", 1, False),
    ("standard", 3, True),
    ("real", 3, False),
    ("real_l2", 2, False),
    ("real_noq", 3, False),
])
def test_stacked_matches_single(image_factory, variant, stride, preemptive):
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas", variant=variant,
                       preemptive=preemptive)
    scalars = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    frames = _frames(image_factory)
    outs, singles = _run_both(frames, cfg, scalars, 4, stride)
    for f in range(B):
        np.testing.assert_array_equal(
            np.asarray(outs.raw_assignment[f]),
            np.asarray(singles[f].raw_assignment),
            err_msg=f"raw assignment mismatch frame {f} ({variant})")
        np.testing.assert_array_equal(
            np.asarray(outs.labels[f]), np.asarray(singles[f].labels),
            err_msg=f"labels mismatch frame {f} ({variant})")
        assert bool(outs.cca_tie[f]) == bool(singles[f].cca_tie)
        for field in ("y", "x", "r", "g", "b", "num_members"):
            np.testing.assert_array_equal(
                np.asarray(getattr(outs.clusters, field)[f]),
                np.asarray(getattr(singles[f].clusters, field)),
                err_msg=f"cluster {field} mismatch frame {f} ({variant})")


def test_batched_candidates_match_single(image_factory):
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    frames = _frames(image_factory)
    st_b = _states(frames)
    cand_b, ovf_b = build_candidates_batched(st_b.y, st_b.x, st_b.is_active,
                                             cfg)
    for f in range(B):
        cand_f, ovf_f = pipeline.build_candidates(
            st_b.y[f], st_b.x[f], st_b.is_active[f], cfg)
        np.testing.assert_array_equal(np.asarray(cand_b[f]),
                                      np.asarray(cand_f))


def test_stacked_warm_start_carries(image_factory):
    """Second batch warm-starts from the first batch's state, exactly like
    repeated single-frame iterates."""
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    scalars = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    frames1 = _frames(image_factory)
    frames2 = _frames(image_factory)
    st_b = _states(frames1)
    out1 = iterate_graph_stacked(jnp.asarray(frames1), st_b, cfg, scalars,
                                 3, 3)
    out2 = iterate_graph_stacked(jnp.asarray(frames2), out1.clusters, cfg,
                                 scalars, 3, 3)
    for f in range(B):
        st_f = jax.tree.map(lambda x, f=f: x[f], st_b)
        s1 = _single(frames1[f], st_f, cfg, scalars, 3, 3)
        s2 = _single(frames2[f], s1.clusters, cfg, scalars, 3, 3)
        np.testing.assert_array_equal(np.asarray(out2.labels[f]),
                                      np.asarray(s2.labels))


def test_stacked_batched_slic_wrapper(image_factory):
    """BatchedSlic(batch_mode='stack') end-to-end == per-frame Slic path."""
    from fast_slic_tpu.parallel.batch import BatchedSlic

    frames = _frames(image_factory)
    bs = BatchedSlic(num_components=K, compactness=10.0,
                     min_size_factor=0.1, arch="pallas",
                     batch_mode="stack")
    labels = np.asarray(bs.iterate(frames, max_iter=4))

    bm = BatchedSlic(num_components=K, compactness=10.0,
                     min_size_factor=0.1, arch="pallas", batch_mode="map")
    labels_map = np.asarray(bm.iterate(frames, max_iter=4))
    np.testing.assert_array_equal(labels, labels_map)
