"""Parity tests for every Pallas TPU kernel, run in interpret mode on CPU.

Each kernel has an XLA/numpy counterpart it must bit-match (the
two-implementations-one-oracle pattern of the reference, which pins separate
goldens per arch: /root/reference/test/test_slic.py:68-72).  Interpret mode
executes the same kernel code the TPU backend compiles, minus Mosaic — these
tests pin the kernel *logic*; the TPU bench separately asserts no fallback.

Covered: pallas/assign_tpu.py, pallas/segsum_tpu.py, pallas/lut_tpu.py,
pallas/cca_tpu.py (also exercised by tests/test_cca.py), plus one end-to-end
arch="pallas" run against a pinned reference golden.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast_slic_tpu import cluster as cl
from fast_slic_tpu import pipeline
from fast_slic_tpu.config import StaticConfig, RuntimeParams, UNASSIGNED
from conftest import make_image

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "golden_ref.npz")


def _setup_assign(rng, H, W, K, **cfgkw):
    cfg_x = StaticConfig(H=H, W=W, K=K, arch="xla", **cfgkw)
    cfg_p = StaticConfig(H=H, W=W, K=K, arch="pallas", **cfgkw)
    image = make_image(rng, H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    planes = jnp.moveaxis(jnp.asarray(image.astype(np.int32)), -1, 0)
    scal = pipeline.derive_scalars(cfg_x, 10.0, 0.1, 0.05)
    cand, _ = pipeline.build_candidates(st.y, st.x, st.is_active, cfg_x)
    return cfg_x, cfg_p, planes, st, cand, scal


@pytest.mark.parametrize("stride,rem", [(1, 0), (3, 1), (3, 2)])
def test_assign_pallas_matches_xla(rng, stride, rem):
    H, W, K = 94, 130, 48
    # debug_mode keeps the per-pass min_dists scatter-back (outside debug
    # the stride path skips it — distances are recorder-only)
    cfg_x, cfg_p, planes, st, cand, scal = _setup_assign(
        rng, H, W, K, convert_to_lab=False, debug_mode=True)
    old = jnp.full([H, W], UNASSIGNED, jnp.int32)

    ref = pipeline.assign_xla(planes, st, cand, cfg_x, scal.coef, old,
                              rem, stride)
    p3 = pipeline._pad_planes_for_pallas(planes, cfg_p)
    got = pipeline.assign_dispatch(planes, p3, st, cand, cfg_p, scal.coef,
                                   old, rem, stride)
    np.testing.assert_array_equal(np.asarray(got.assignment),
                                  np.asarray(ref.assignment))
    # distances match wherever a row was written this pass
    wrote = (np.arange(H)[:, None] % stride) == rem
    np.testing.assert_array_equal(
        np.asarray(got.min_dists)[wrote.repeat(W, 1)],
        np.asarray(ref.min_dists)[wrote.repeat(W, 1)])


def test_assign_pallas_euclidean_patch(rng):
    H, W, K = 66, 70, 25
    cfg_x, cfg_p, planes, st, cand, scal = _setup_assign(
        rng, H, W, K, convert_to_lab=False, manhattan_spatial_dist=False)
    old = jnp.full([H, W], UNASSIGNED, jnp.int32)
    ref = pipeline.assign_xla(planes, st, cand, cfg_x, scal.coef, old, 0, 1)
    p3 = pipeline._pad_planes_for_pallas(planes, cfg_p)
    got = pipeline.assign_dispatch(planes, p3, st, cand, cfg_p, scal.coef,
                                   old, 0, 1)
    np.testing.assert_array_equal(np.asarray(got.assignment),
                                  np.asarray(ref.assignment))


@pytest.mark.parametrize("variant", ["real", "real_l2", "real_noq"])
@pytest.mark.parametrize("stride,rem", [(1, 0), (3, 2)])
def test_assign_pallas_float_matches_xla(rng, variant, stride, rem):
    H, W, K = 94, 130, 48
    cfg_x = StaticConfig(H=H, W=W, K=K, arch="xla", variant=variant,
                         convert_to_lab=False, debug_mode=True)
    cfg_p = StaticConfig(H=H, W=W, K=K, arch="pallas", variant=variant,
                         convert_to_lab=False, debug_mode=True)
    image = make_image(rng, H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    # non-integer centroids exercise the float window/trunc paths
    st = st.__class__(y=st.y + 0.37, x=st.x + 0.61, r=st.r, g=st.g, b=st.b,
                      num_members=st.num_members, is_active=st.is_active,
                      is_updatable=st.is_updatable)
    planes = jnp.moveaxis(jnp.asarray(image.astype(np.int32)), -1, 0)
    scal = pipeline.derive_scalars(cfg_x, 10.0, 0.1, 0.05)
    cand, _ = pipeline.build_candidates(st.y, st.x, st.is_active, cfg_x)
    old = jnp.full([H, W], UNASSIGNED, jnp.int32)
    ref = pipeline.assign_xla(planes, st, cand, cfg_x, scal.coef, old,
                              rem, stride)
    p3 = pipeline._pad_planes_for_pallas(planes, cfg_p)
    got = pipeline.assign_dispatch(planes, p3, st, cand, cfg_p, scal.coef,
                                   old, rem, stride)
    np.testing.assert_array_equal(np.asarray(got.assignment),
                                  np.asarray(ref.assignment))
    wrote = np.asarray(got.assignment) != UNASSIGNED
    np.testing.assert_array_equal(np.asarray(got.min_dists)[wrote],
                                  np.asarray(ref.min_dists)[wrote])


def test_assign_pallas_lsc_matches_xla(rng):
    from fast_slic_tpu.ops import lsc as lsc_ops
    H, W, K = 94, 130, 48
    cfg_x = StaticConfig(H=H, W=W, K=K, arch="xla", variant="lsc")
    cfg_p = StaticConfig(H=H, W=W, K=K, arch="pallas", variant="lsc")
    image = make_image(rng, H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(image, K))
    scal = pipeline.derive_scalars(cfg_x, 10.0, 0.1, 0.05)
    planes, st, lsc_state = pipeline.stage_setup(jnp.asarray(image), st,
                                                 cfg_x, scal)
    lsc_feats, lsc_w, lsc_cent = lsc_state
    cand, _ = pipeline.build_candidates(st.y, st.x, st.is_active, cfg_x)
    old = jnp.full([H, W], UNASSIGNED, jnp.int32)
    ref = pipeline.assign_xla(planes, st, cand, cfg_x, scal.coef, old,
                              0, 1, lsc_feats, lsc_cent)
    p3 = pipeline._pad_planes_for_pallas(planes, cfg_p)
    fp3 = pipeline._pad_planes_for_pallas(lsc_feats, cfg_p, jnp.float32)
    got = pipeline.assign_dispatch(planes, p3, st, cand, cfg_p, scal.coef,
                                   old, 0, 1, lsc_feats, lsc_cent, fp3)
    np.testing.assert_array_equal(np.asarray(got.assignment),
                                  np.asarray(ref.assignment))


def test_segsum_pallas_matches_scatter(rng):
    from fast_slic_tpu.pallas.segsum_tpu import segment_sum_pallas
    N, V, K = 5000, 6, 300
    # spatially coherent ids (sorted) exercise the band guard the way the
    # pipeline produces them, plus a shuffled tail for the general case
    ids = np.sort(rng.integers(0, K + 1, size=N)).astype(np.int32)
    ids[-500:] = rng.integers(0, K + 1, size=500)
    vals = rng.integers(0, 1 << 16, size=(V, N)).astype(np.int32)
    ref = np.zeros((K + 1, V), np.int64)
    np.add.at(ref, ids, vals.T)
    got = segment_sum_pallas(jnp.asarray(ids), jnp.asarray(vals), K,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ref.T.astype(np.int32))


def test_slic_update_pallas_matches_scatter(rng):
    from fast_slic_tpu.pallas.segsum_tpu import slic_update_pallas
    W, Hs, K, stride, rem = 130, 40, 48, 3, 1
    N = Hs * W
    ids = np.sort(rng.integers(0, K, size=N)).astype(np.int32)
    mask = (rng.random(N) < 0.9).astype(np.int32)
    p = rng.integers(0, 256, size=(3, N)).astype(np.int32)
    got = np.asarray(slic_update_pallas(
        jnp.asarray(ids), jnp.asarray(mask), *map(jnp.asarray, p),
        jnp.int32(rem), K, W, stride, True))
    ii = (np.arange(N) // W) * stride + rem
    jj = np.arange(N) % W
    vals = np.stack([mask, ii * mask, jj * mask,
                     p[0] * mask, p[1] * mask, p[2] * mask])
    ref = np.zeros((6, K + 1), np.int64)
    for c in range(6):
        np.add.at(ref[c], ids, vals[c])
    np.testing.assert_array_equal(got, ref.astype(np.int32))


def test_lab_pallas_matches_xla(rng):
    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_pallas
    from fast_slic_tpu.ops.cielab import rgb_to_lab_quantized
    img = rng.integers(0, 256, size=(45, 67, 3)).astype(np.uint8)
    # include the table extremes
    img[0, 0] = (0, 0, 0)
    img[0, 1] = (255, 255, 255)
    ref = np.asarray(rgb_to_lab_quantized(jnp.asarray(img)))
    got = np.asarray(rgb_to_lab_pallas(jnp.asarray(img), interpret=True))
    np.testing.assert_array_equal(got, ref)
    # planar wrapper: same kernel, channel-planar [3, H, W] layout
    from fast_slic_tpu.pallas.lut_tpu import rgb_to_lab_planar
    got_p = np.asarray(rgb_to_lab_planar(jnp.asarray(img), interpret=True))
    np.testing.assert_array_equal(got_p, np.moveaxis(ref, -1, 0))


def test_propagate_min_pallas_matches_gather(rng):
    from fast_slic_tpu.pallas.cca_tpu import propagate_min_pallas
    H, W = 40, 60
    labels = rng.integers(0, 6, size=(H, W)).astype(np.int32)
    n = H * W
    m0 = np.full((H, W), 0x7FFFFFFF, np.int32)
    seeds = rng.integers(0, n, size=25)
    m0.reshape(-1)[seeds] = rng.integers(0, 1000, size=25)
    got = np.asarray(propagate_min_pallas(
        jnp.asarray(labels), jnp.asarray(m0), interpret=True))
    # oracle: fixpoint of neighbor-min over equal labels
    ref = m0.astype(np.int64)
    while True:
        prev = ref.copy()
        for (di, dj) in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            sl = np.full_like(ref, 0x7FFFFFFF)
            lb = np.full_like(labels, -9)
            ss = np.s_[max(di, 0):H + min(di, 0), max(dj, 0):W + min(dj, 0)]
            ds = np.s_[max(-di, 0):H + min(-di, 0), max(-dj, 0):W + min(-dj, 0)]
            sl[ds] = prev[ss]
            lb[ds] = labels[ss]
            ref = np.minimum(ref, np.where(lb == labels, sl, 0x7FFFFFFF))
        if (ref == prev).all():
            break
    np.testing.assert_array_equal(got, ref.astype(np.int32))


def test_e2e_pallas_golden():
    """Full pipeline with arch='pallas' (interpret-mode assign kernel on CPU)
    reproduces the pinned reference golden bit-for-bit — the per-arch golden
    pattern of /root/reference/test/test_slic.py:68-72."""
    golden = np.load(DATA)
    image = golden["image"]
    H, W = image.shape[:2]
    K = 256
    cfg = StaticConfig(H=H, W=W, K=K, arch="pallas")
    st = cl.initialize_clusters(image, K)
    fn = pipeline.compiled_iterate(cfg, 10, 3)
    scalars = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
    out = fn(image, jax.tree.map(jnp.asarray, st), scalars)
    assert not bool(np.asarray(out.cca_tie))
    labels = np.asarray(out.labels)
    np.testing.assert_array_equal(labels, golden["std_k256_msf01"])


def test_banded_lookup_pallas_matches_gather(rng):
    from fast_slic_tpu.pallas.segsum_tpu import banded_lookup_pallas
    N, E = 7000, 900
    # spatially coherent ids (the CCA relabel produces component ids that
    # increase with pixel position), values < 2^16
    ids = np.sort(rng.integers(0, E, size=N)).astype(np.int32)
    table = rng.integers(0, 1 << 16, size=E).astype(np.int32)
    got = np.asarray(banded_lookup_pallas(
        jnp.asarray(ids), jnp.asarray(table), E, True))
    np.testing.assert_array_equal(got, table[ids])


def test_banded_lookup_pallas_scattered_ids(rng):
    # incoherent ids still give correct answers (just a wider band)
    from fast_slic_tpu.pallas.segsum_tpu import banded_lookup_pallas
    N, E = 4096, 257
    ids = rng.integers(0, E, size=N).astype(np.int32)
    table = rng.integers(0, 1 << 16, size=E).astype(np.int32)
    got = np.asarray(banded_lookup_pallas(
        jnp.asarray(ids), jnp.asarray(table), E, True))
    np.testing.assert_array_equal(got, table[ids])


def test_lsc_color_feats_pallas_matches_gather(rng):
    from fast_slic_tpu.pallas.lut_tpu import lsc_color_feats_pallas
    from fast_slic_tpu.ops import lsc as lsc_ops
    cfg = StaticConfig(H=94, W=130, K=32, variant="lsc")
    t = lsc_ops.trig_tables(cfg, 10.0)
    planes = rng.integers(0, 256, (94, 130, 3)).astype(np.int32)
    planes_pl = np.moveaxis(planes, -1, 0)
    got = np.asarray(lsc_color_feats_pallas(
        jnp.asarray(planes_pl), t["L_cos"], t["L_sin"], t["color_cos"],
        t["color_sin"], interpret=True))
    ref = np.stack(
        [t["L_cos"][planes[..., 0]], t["L_sin"][planes[..., 0]],
         t["color_cos"][planes[..., 1]], t["color_sin"][planes[..., 1]],
         t["color_cos"][planes[..., 2]], t["color_sin"][planes[..., 2]]],
        axis=0)
    np.testing.assert_array_equal(got, ref)


def test_float_segsum_pallas_matches_scatter(rng):
    from fast_slic_tpu.pallas.segsum_tpu import float_segsum_pallas
    N, V, K = 5000, 11, 300
    ids = np.sort(rng.integers(0, K + 1, size=N)).astype(np.int32)
    mask = (rng.random(N) < 0.9).astype(np.int32)
    vals = rng.random((V, N)).astype(np.float32)
    got = np.asarray(float_segsum_pallas(
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(vals), K, True))
    ref = np.zeros((K + 1, V), np.float64)
    np.add.at(ref, ids, (vals * mask).T)
    # f32 accumulation-order tolerance (the kernel sums per tile then
    # merges; the reference here sums serially)
    np.testing.assert_allclose(got, ref.T.astype(np.float32), rtol=2e-6,
                               atol=1e-4)


def test_assign_merge_yx_equivalence(rng, monkeypatch):
    """The merged-yx candidate layout must be output-identical to the
    classic 6-field layout, including fractional warm-start centers (the
    kernel only ever uses int-cast centers in the standard variant, so
    pre-truncating the packed field is exact)."""
    from fast_slic_tpu.pallas import assign_tpu
    H, W, K = 94, 130, 48
    cfg_x, cfg_p, planes, st, cand, scal = _setup_assign(
        rng, H, W, K, convert_to_lab=False, debug_mode=True)
    # fractional + slightly-negative centers (the shardmap local-coordinate
    # case) — int-cast/trunc must agree across layouts
    st = st.__class__(y=st.y + 0.37 - 2.0, x=st.x + 0.61, r=st.r, g=st.g,
                      b=st.b, num_members=st.num_members,
                      is_active=st.is_active, is_updatable=st.is_updatable)
    cand, _ = pipeline.build_candidates(st.y, st.x, st.is_active, cfg_x)
    old = jnp.full([H, W], UNASSIGNED, jnp.int32)
    p3 = pipeline._pad_planes_for_pallas(planes, cfg_p)

    def run():
        got = pipeline.assign_dispatch(planes, p3, st, cand, cfg_p,
                                       scal.coef, old, 1, 3)
        return np.asarray(got.assignment), np.asarray(got.min_dists)

    a_m, d_m = run()
    monkeypatch.setattr(assign_tpu, "MERGE_YX", False)
    a_c, d_c = run()
    np.testing.assert_array_equal(a_m, a_c)
    np.testing.assert_array_equal(d_m, d_c)


def test_float_segsum_wrow_fusion_matches_premultiplied(rng):
    """The in-kernel weight multiply (wrow) must be bit-identical to
    feeding pre-multiplied values (mask is 0/1, so (f*mask)*(w*mask) ==
    (f*w)*mask exactly)."""
    from fast_slic_tpu.pallas.segsum_tpu import float_segsum_pallas
    N, K = 5000, 300
    ids = np.sort(rng.integers(0, K + 1, size=N)).astype(np.int32)
    mask = (rng.random(N) < 0.9).astype(np.int32)
    feats = (rng.random((10, N)) * 4 - 2).astype(np.float32)
    w = (rng.random(N) * 2 + 0.5).astype(np.float32)
    vals_raw = np.concatenate([feats, w[None]], axis=0)
    vals_pre = np.concatenate([feats * w[None], w[None]], axis=0)
    fused = np.asarray(float_segsum_pallas(
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(vals_raw), K,
        True, wrow=10))
    pre = np.asarray(float_segsum_pallas(
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(vals_pre), K,
        True))
    np.testing.assert_array_equal(fused, pre)


def test_update_padded_matches_presliced(rng):
    """slic_update_padded_pallas (validity/ids/coords derived in-kernel
    from the padded buffers) must equal slic_update_pallas on the masked
    pre-sliced inputs — including pad rows that carry (ignorable)
    assignments and frame-grid (hmod) offsets."""
    from fast_slic_tpu.pallas.segsum_tpu import (slic_update_padded_pallas,
                                                 slic_update_pallas)
    K, Wp, W, Hsp, Hs, stride, rem = 24, 128, 100, 64, 40, 3, 1
    for B in (1, 3):
        a_pad = rng.integers(0, K, size=(B * Hsp, Wp)).astype(np.int32)
        # sprinkle UNASSIGNED + give pad rows live-looking values
        a_pad[rng.random((B * Hsp, Wp)) < 0.07] = 0xFFFF
        p3 = rng.integers(0, 256, size=(3, B * Hsp, Wp)).astype(np.int32)
        hmod = Hsp if B > 1 else 0
        got = np.asarray(slic_update_padded_pallas(
            jnp.asarray(a_pad), jnp.asarray(p3), jnp.int32(rem),
            jnp.int32(K), B * K, Wp, W, Hs, stride, True, hmod=hmod))
        # reference: mask + offset host-side, feed the pack-based kernel
        a3 = a_pad.reshape(B, Hsp, Wp)
        rowv = (np.arange(Hsp) < Hs)[None, :, None]
        colv = (np.arange(Wp) < W)[None, None, :]
        valid = (a3 != 0xFFFF) & rowv & colv
        offs = (np.arange(B, dtype=np.int32) * K)[:, None, None]
        ids = np.where(valid, a3 + offs, offs)
        ref = np.asarray(slic_update_pallas(
            jnp.asarray(ids.reshape(-1)),
            jnp.asarray(valid.astype(np.int32).reshape(-1)),
            jnp.asarray(p3[0].ravel()), jnp.asarray(p3[1].ravel()),
            jnp.asarray(p3[2].ravel()), jnp.int32(rem), B * K, Wp,
            stride, True, hmod=Hsp))
        np.testing.assert_array_equal(got, ref)


def test_framed_segsum_matches_per_frame(rng):
    """framed_segment_sum_pallas == B independent segment_sum_pallas calls."""
    from fast_slic_tpu.pallas.segsum_tpu import (framed_segment_sum_pallas,
                                                 segment_sum_pallas)
    B, Nf, V, MF = 3, 5000, 5, 300
    ids = np.sort(rng.integers(0, MF, size=(B, Nf)), axis=1).astype(np.int32)
    vals = rng.integers(0, 1 << 14, size=(V, B, Nf)).astype(np.int32)
    got = np.asarray(framed_segment_sum_pallas(
        jnp.asarray(ids), jnp.asarray(vals), MF, True))     # [B, V, MF]
    for b in range(B):
        ref = np.asarray(segment_sum_pallas(
            jnp.asarray(ids[b]), jnp.asarray(vals[:, b]), MF, True))
        np.testing.assert_array_equal(got[b], ref[:, :MF])


def test_assign_occ_skip_equivalence(rng, monkeypatch):
    """The dynamic slot-occupancy bound (assign_tpu._occupancy_strips) must be
    output-invariant: skipped slots are empty in every cell and can never
    win a pixel.  A/B the same pass with the bound disabled."""
    H, W, K = 94, 130, 48
    cfg_x, cfg_p, planes, st, cand, scal = _setup_assign(
        rng, H, W, K, convert_to_lab=False, debug_mode=True)
    old = jnp.full([H, W], UNASSIGNED, jnp.int32)
    p3 = pipeline._pad_planes_for_pallas(planes, cfg_p)

    def run():
        got = pipeline.assign_dispatch(planes, p3, st, cand, cfg_p,
                                       scal.coef, old, 1, 3)
        return np.asarray(got.assignment), np.asarray(got.min_dists)

    a_on, d_on = run()
    from fast_slic_tpu.pallas import assign_tpu
    monkeypatch.setattr(assign_tpu, "OCC_BOUND", False)
    jax.clear_caches()
    a_off, d_off = run()
    np.testing.assert_array_equal(a_on, a_off)
    np.testing.assert_array_equal(d_on, d_off)
