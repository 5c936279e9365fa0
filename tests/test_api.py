"""Python API surface parity (reference test/test_slic.py shape tests plus
binding-layer error contracts)."""

import numpy as np
import pytest

import fast_slic_tpu as fst
from fast_slic_tpu import Slic, SlicModel, LSC
from fast_slic_tpu.avx2 import SlicAvx2


def test_supported_archs():
    assert "standard" in fst.supported_archs
    assert "xla" in fst.supported_archs
    assert "pallas" in fst.supported_archs
    assert fst.is_supported_arch("x64/avx2")
    assert not fst.is_supported_arch("riscv/vector")


def test_model_errors():
    with pytest.raises(NotImplementedError):
        SlicModel(10, "nope")
    with pytest.raises(ValueError):
        SlicModel(0)
    with pytest.raises(ValueError):
        SlicModel(65534)
    m = SlicModel(10)
    with pytest.raises(RuntimeError):
        m.iterate(np.zeros([8, 8, 3], np.uint8), 2, 10, 0.1, 3)
    with pytest.raises(ValueError):
        m.initialize(np.zeros([8, 8, 4], np.uint8))


def test_slic_model_clusters():
    x = np.zeros([120, 160, 3], np.uint8)
    slic = Slic(num_components=32)
    slic.iterate(x)
    for i, cluster in enumerate(slic.slic_model.clusters):
        assert cluster["number"] == i
        assert isinstance(cluster, dict)
        assert len(cluster["yx"]) == 2
        assert isinstance(cluster["yx"], tuple)
        assert len(cluster["color"]) == 3
        assert isinstance(cluster["color"], tuple)
        assert isinstance(cluster["num_members"], int)


def test_slic_model_clusters_setter():
    x = np.zeros([120, 160, 3], np.uint8)
    slic = Slic(num_components=32)
    slic.iterate(x)
    orig = slic.slic_model.clusters
    slic.slic_model.clusters = orig[:10]
    assert len(slic.slic_model.clusters) == 10
    assert slic.slic_model.clusters == orig[:10]
    assert slic.slic_model.num_components == 10
    assert slic.num_components == 10


def test_iterate_output_contract(image_factory):
    img = image_factory(96, 128)
    slic = Slic(num_components=24, min_size_factor=0.1)
    out = slic.iterate(img)
    assert out.dtype == np.int16
    assert out.shape == (96, 128)
    assert out.min() >= 0 and out.max() < 24
    assert slic.last_assignment is out
    assert slic.slic_model.last_timing_report.startswith('{"name": "iterate"')


def test_warm_start_from_model(image_factory):
    img = image_factory(64, 64)
    a = Slic(num_components=16)
    a.iterate(img)
    b = Slic(num_components=16, slic_model=a.slic_model)
    out = b.iterate(img)
    assert out.shape == (64, 64)
    # warm start copies; mutating b's model must not touch a's
    assert b.slic_model is not a.slic_model


def test_avx2_alias_runs(image_factory):
    img = image_factory(64, 64)
    out = SlicAvx2(num_components=12).iterate(img)
    assert out.shape == (64, 64)


def test_lsc_runs(image_factory):
    img = image_factory(64, 64)
    out = LSC(num_components=12).iterate(img)
    assert out.shape == (64, 64)
    assert out.min() >= 0


def test_enforce_connectivity_toplevel():
    labels = np.zeros([10, 10], np.int16)
    labels[2:4, 2:4] = 1  # 4-px blob below threshold
    out = fst.enforce_connectivity(labels, 5)
    assert (np.asarray(out) == 0).all()


def test_connectivity_and_density(image_factory):
    img = image_factory(80, 80)
    slic = Slic(num_components=9, min_size_factor=0.2)
    assignment = slic.iterate(img)
    conn = slic.slic_model.get_connectivity(assignment)
    lists = conn.tolist()
    assert len(lists) == 9
    # adjacency is symmetric and self-free
    for i, l in enumerate(lists):
        assert i not in l
        for j in l:
            assert i in lists[j]

    knn = slic.slic_model.get_knn_connectivity(assignment, 4)
    assert all(len(l) <= 4 for l in knn.tolist())

    mask = (img[..., 0] > 128).astype(np.uint8)
    dens = slic.slic_model.get_mask_density(mask * 255, assignment)
    assert dens.shape == (9,) and dens.dtype == np.uint8
    back = slic.slic_model.broadcast_density_to_mask(dens, assignment)
    assert back.shape == (80, 80) and back.dtype == np.uint8


def test_debug_recorder(image_factory):
    img = image_factory(40, 40)
    slic = Slic(num_components=4, debug_mode=True)
    slic.iterate(img, max_iter=2)
    import json
    report = json.loads(slic.slic_model.last_recorder_report)
    assert report["height"] == 40 and report["width"] == 40
    assert [s["iteration"] for s in report["snapshots"]] == [-1, 0, 1]
    assert len(report["snapshots"][0]["assignment"]) == 1600
    assert report["snapshots"][1]["clusters"][0]["number"] == 0


def test_preemptive_matches_oracle(image_factory):
    # Preemptive mode approximates the non-preemptive result (it freezes
    # converged clusters), but it must match the reference's preemptive
    # semantics exactly — validated via the oracle (which is itself pinned
    # against a build of the reference C++; scripts/compare_vs_reference.py).
    from fast_slic_tpu import cluster as cl
    from fast_slic_tpu.config import StaticConfig, RuntimeParams
    from fast_slic_tpu.oracle import numpy_ref as oracle

    img = image_factory(96, 96)
    pre = Slic(num_components=16, preemptive=True,
               preemptive_thres=0.05)
    out = pre.iterate(img)
    cfg = StaticConfig(H=96, W=96, K=16, preemptive=True)
    st = cl.initialize_clusters(img, 16)
    ref, _ = oracle.iterate_oracle(
        img, st, cfg,
        RuntimeParams(compactness=10, min_size_factor=0.25,
                      subsample_stride=3, max_iter=10,
                      preemptive_thres=0.05))
    np.testing.assert_array_equal(out, ref)


def test_knn_native_matches_python_spec(rng):
    # the compiled KNN (native/cca_native.cpp fstpu_knn) must reproduce the
    # python executable spec bit-for-bit, including the reference's heap
    # early-skip quirk and heap-layout output order (fast-slic.cpp:80-130)
    from fast_slic_tpu.ops import graph
    from fast_slic_tpu import cluster as cl, native
    if not native.available():
        import pytest
        pytest.skip("no g++")
    K, H, W = 300, 240, 320
    st = cl.zeros(K)
    st.y[:] = rng.uniform(0, H, K).astype(np.float32)
    st.x[:] = rng.uniform(0, W, K).astype(np.float32)
    for m in (1, 4, 12):
        assert graph.knn(st, m, (H, W)) == graph.knn_python(st, m, (H, W))


def test_profile_timing_report(image_factory):
    """slic_model.profile=True: per-iteration assign/update sections in the
    timing report (reference fstimer schema, context.cpp:158-175), with
    bit-identical labels to the default fused program."""
    import json
    from fast_slic_tpu import Slic

    image = image_factory(48, 64)
    s1 = Slic(num_components=12, min_size_factor=0.1)
    ref = s1.iterate(image, max_iter=4)

    s2 = Slic(num_components=12, min_size_factor=0.1)
    s2.slic_model.profile = True
    got = s2.iterate(image, max_iter=4)
    np.testing.assert_array_equal(got, ref)

    rep = json.loads(s2.slic_model.last_timing_report)
    assert rep["name"] == "iterate"
    exe = [c for c in rep["children"] if c["name"] == "execute"][0]
    names = [c["name"] for c in exe["children"]]
    assert names.count("assign") == 4
    assert names.count("update") == 4
    for want in ("cielab_conversion", "write_to_buffer", "full_assign",
                 "enforce_connectivity"):
        assert want in names, names
    assert all(isinstance(c.get("duration"), int) for c in exe["children"])
