"""Connectivity enforcement: XLA label propagation vs union-find oracle.

The two implementations share no code; equality here validates the whole
chain (component leaders, leader-order numbering, area threshold, top-K,
orphan adoption) including adversarial patterns.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_slic_tpu.ops.cca import (
    enforce_connectivity_xla_flagged, connected_components)
from fast_slic_tpu.oracle.numpy_ref import enforce_connectivity_np
from fast_slic_tpu.config import UNASSIGNED
from fast_slic_tpu import native


def run_both(labels, K, thres):
    """XLA CCA vs the union-find oracle.

    When component areas tie exactly at the top-K boundary, the device path
    flags it and the product re-runs CCA on the host (runner.py) — so here
    we substitute the native host result exactly like the product does.
    """
    ours, tie = enforce_connectivity_xla_flagged(
        jnp.asarray(labels.astype(np.int32)), K, jnp.int32(thres))
    ours = np.asarray(ours)
    if bool(np.asarray(tie)):
        assert native.available()
        ours = native.enforce_connectivity_native(
            labels.astype(np.uint16), K, thres).astype(np.int64)
    ref = enforce_connectivity_np(labels.astype(np.uint16), K, thres)
    return ours, ref.astype(np.int64)


@pytest.mark.parametrize("thres", [0, 3, 25])
def test_random_labels(rng, thres):
    labels = rng.integers(0, 6, size=(24, 31)).astype(np.uint16)
    ours, ref = run_both(labels, 6, thres)
    np.testing.assert_array_equal(ours, ref)


def test_with_unassigned(rng):
    labels = rng.integers(0, 5, size=(20, 20)).astype(np.uint16)
    labels[labels == 4] = UNASSIGNED
    ours, ref = run_both(labels, 5, 4)
    np.testing.assert_array_equal(ours, ref)


def test_spiral_worst_case():
    # single-label spiral: a long snaking component stresses propagation
    H = W = 33
    labels = np.ones([H, W], np.uint16)
    # carve a spiral of label 0 into a field of label 1
    y, x = 0, 0
    dy, dx = 0, 1
    seen = np.zeros([H, W], bool)
    for _ in range(H * W):
        labels[y, x] = 0
        seen[y, x] = True
        ny, nx = y + 2 * dy, x + 2 * dx
        if not (0 <= ny < H and 0 <= nx < W) or seen[ny, nx]:
            dy, dx = dx, -dy
        if 0 <= y + dy < H and 0 <= x + dx < W and not seen[y + dy, x + dx]:
            y, x = y + dy, x + dx
        else:
            break
    ours, ref = run_both(labels, 4, 2)
    np.testing.assert_array_equal(ours, ref)


def test_uniform_label():
    labels = np.zeros([16, 16], np.uint16)
    ours, ref = run_both(labels, 3, 10)
    np.testing.assert_array_equal(ours, ref)
    assert (ours == 0).all()


def test_topk_drop(rng):
    # more components above threshold than K -> smallest get absorbed
    labels = np.zeros([12, 40], np.uint16)
    # 5 vertical stripes of label 1 with different widths in a label-0 field
    widths = [2, 3, 4, 5, 6]
    x = 1
    for w in widths:
        labels[:, x:x + w] = 1
        x += w + 2
    ours, ref = run_both(labels, 4, 1)
    np.testing.assert_array_equal(ours, ref)


def test_checkerboard():
    labels = (np.indices((17, 19)).sum(axis=0) % 2).astype(np.uint16)
    ours, ref = run_both(labels, 30, 1)
    np.testing.assert_array_equal(ours, ref)


def test_pallas_strip_path_matches_jumping(rng):
    # on TPU, large images take the Pallas segmented-doubling strip kernel
    # instead of pointer jumping; run that exact kernel in interpret mode
    # (the code path the `jax.default_backend() == "tpu"` gate selects) and
    # compare against the jumping path
    from fast_slic_tpu.pallas.cca_tpu import connected_components_pallas
    labels = rng.integers(0, 5, size=(40, 50)).astype(np.int32)
    L_jump = np.asarray(connected_components(jnp.asarray(labels)))
    L_pallas = np.asarray(connected_components_pallas(
        jnp.asarray(labels), interpret=True))
    np.testing.assert_array_equal(L_pallas, L_jump)


def test_maxc_overflow_flag(rng):
    # a checkerboard has ~n/2 components; with a small max_components the
    # device path must raise the flag so the host re-runs CCA
    from fast_slic_tpu.ops.cca import enforce_connectivity_xla_flagged
    labels = (np.indices((16, 16)).sum(axis=0) % 2).astype(np.int32)
    _, flag = enforce_connectivity_xla_flagged(
        jnp.asarray(labels), 4, jnp.int32(1), max_components=16)
    assert bool(np.asarray(flag))


def test_connected_components_leaders(rng):
    labels = rng.integers(0, 3, size=(15, 17)).astype(np.int32)
    L = np.asarray(connected_components(jnp.asarray(labels)))
    # every component's label equals the min linear index of its members
    flat = L.ravel()
    for leader in np.unique(flat):
        members = np.nonzero(flat == leader)[0]
        assert members.min() == leader


def test_pallas_strip_store_variants_identical(rng):
    # mask store ("i32" per-step clamp values vs "packed" bit-packed flags)
    # and strip height are pure VMEM/perf knobs: outputs must be identical
    # (the VMEM chooser picks them per image width; 1080p falls to packed —
    # the round-3 Mosaic OOM fix)
    from fast_slic_tpu.pallas.cca_tpu import connected_components_pallas
    labels = rng.integers(0, 6, size=(70, 90)).astype(np.int32)
    ref = np.asarray(connected_components_pallas(
        jnp.asarray(labels), strip=96, store="i32", interpret=True))
    for strip, store in ((96, "packed"), (64, "packed"), (32, "packed"),
                         (160, "packed")):
        out = np.asarray(connected_components_pallas(
            jnp.asarray(labels), strip=strip, store=store, interpret=True))
        np.testing.assert_array_equal(out, ref, err_msg=f"{strip}/{store}")


def test_two_pass_bounded_matches_fixpoint(rng):
    # provably-2-pass mode: content whose equal-label regions span <= 2S+1
    # rows (a real SLIC-like fragment map) must produce the identical
    # fixpoint with the confirm sweep skipped (content_bounded=True), and
    # with content_bounded=False must still take the full fixpoint loop
    from fast_slic_tpu.pallas.cca_tpu import connected_components_pallas
    S = 6
    H, W = 70, 90
    # synthesize bounded-height labels: rows banded into 2S+1 strips with
    # random per-band labels so no region crosses a band boundary
    bands = (np.arange(H) // (2 * S + 1))[:, None]
    labels = (rng.integers(0, 4, size=(H, W)) + 10 * bands).astype(np.int32)
    ref = np.asarray(connected_components_pallas(
        jnp.asarray(labels), strip=32, interpret=True))
    for cb in (True, False):
        out = np.asarray(connected_components_pallas(
            jnp.asarray(labels), strip=32, interpret=True,
            bounded_h=2 * S + 1, content_bounded=jnp.bool_(cb)))
        np.testing.assert_array_equal(out, ref, err_msg=f"bounded={cb}")
    # bound larger than the cover (strip/2+1) must fall back to the loop
    out = np.asarray(connected_components_pallas(
        jnp.asarray(labels), strip=16, interpret=True,
        bounded_h=2 * S + 1, content_bounded=jnp.bool_(True)))
    np.testing.assert_array_equal(out, ref)


def test_two_pass_unbounded_content_falls_back(rng):
    # a spiral (worst-case winding component) violates any height bound;
    # with content_bounded=False at runtime the fixpoint loop must still
    # resolve it exactly even though bounded_h was passed
    from fast_slic_tpu.pallas.cca_tpu import connected_components_pallas
    H, W = 33, 33
    labels = np.ones((H, W), np.int32)
    labels[::4, :] = 2
    for i, r in enumerate(range(0, H, 4)):
        if r + 4 < H:
            col = 0 if i % 2 == 0 else W - 1
            labels[r:r + 4, col] = 2  # connect alternating band ends
    ref = np.asarray(connected_components(jnp.asarray(labels)))
    out = np.asarray(connected_components_pallas(
        jnp.asarray(labels), strip=16, interpret=True,
        bounded_h=5, content_bounded=jnp.bool_(False)))
    np.testing.assert_array_equal(out, ref)


def test_selection_rerun_matches_oracle_on_ties(rng):
    """The selection-only tie escalation (device parts + host heap
    selection + device relabel) must reproduce the oracle's (reference's)
    labels EXACTLY on content whose component areas tie at the top-K
    boundary — the case the fused device path flags."""
    from fast_slic_tpu.ops.cca import selection_rerun_device

    # many equal-area blobs: a block grid where K < number of blocks, so
    # the top-K boundary always lands inside an area tie
    blocks = rng.integers(0, 4, size=(6, 8)).astype(np.uint16)
    labels = np.kron(blocks, np.ones((4, 4), np.uint16))
    K = 4
    for thres in (0, 5):
        ours, tie = enforce_connectivity_xla_flagged(
            jnp.asarray(labels.astype(np.int32)), K, jnp.int32(thres))
        ref = enforce_connectivity_np(labels, K, thres)
        fixed = selection_rerun_device(
            jnp.asarray(labels.astype(np.int32)), K,
            labels.size, None, thres)
        assert fixed is not None
        np.testing.assert_array_equal(np.asarray(fixed),
                                      ref.astype(np.int32))


def test_selection_rerun_overflow_falls_back(rng):
    """More components than maxc -> selection re-run must refuse (None)."""
    from fast_slic_tpu.ops.cca import selection_rerun_device
    labels = (np.indices((16, 16)).sum(0) % 2).astype(np.uint16)  # checker
    out = selection_rerun_device(jnp.asarray(labels.astype(np.int32)),
                                 4, 8, None, 0)
    assert out is None
