"""Cluster grid seeding parity (context.cpp:43-97 semantics)."""

import numpy as np

from fast_slic_tpu import cluster as cl


def test_seeding_small_exact():
    # H=10, W=10, K=4: n_y=2, n_xs=[2,2], h=5, w=5
    # centers: (2,2), (2,7), (7,2), (7,7)
    img = np.zeros([10, 10, 3], np.uint8)
    img[2, 2] = [1, 2, 3]
    img[7, 7] = [9, 8, 7]
    st = cl.initialize_clusters(img, 4)
    np.testing.assert_array_equal(st.y, [2, 2, 7, 7])
    np.testing.assert_array_equal(st.x, [2, 7, 2, 7])
    np.testing.assert_array_equal(
        np.stack([st.r, st.g, st.b], -1)[0], [1, 2, 3])
    np.testing.assert_array_equal(
        np.stack([st.r, st.g, st.b], -1)[3], [9, 8, 7])
    assert st.is_active.all() and st.is_updatable.all()
    assert (st.num_members == 0).all()


def test_seeding_remainder_distribution():
    # K=5: n_y=2, base 2 each, remainder 1 -> row 0 gets 3 (rows 0,2,4... cap)
    img = np.zeros([20, 30, 3], np.uint8)
    st = cl.initialize_clusters(img, 5)
    # h=10; row 0 band: w=ceil(30/3)=10 -> x centers 5,15,25 at y=5
    # row 1 band: w=ceil(30/2)=15 -> x centers 7,22 at y=15
    np.testing.assert_array_equal(st.y, [5, 5, 5, 15, 15])
    np.testing.assert_array_equal(st.x, [5, 15, 25, 7, 22])


def test_seeding_overflow_goes_center():
    img = np.zeros([8, 8, 3], np.uint8)
    st = cl.initialize_clusters(img, 63)  # n_y=7, dense grid, overflow dumped
    assert st.y.shape[0] == 63
    assert (st.y >= 0).all() and (st.y <= 7).all()
    assert (st.x >= 0).all() and (st.x <= 7).all()


def test_cluster_dict_roundtrip():
    img = np.arange(10 * 12 * 3, dtype=np.uint8).reshape(10, 12, 3)
    st = cl.initialize_clusters(img, 6)
    dicts = cl.clusters_to_dicts(st)
    assert [d["number"] for d in dicts] == list(range(6))
    st2 = cl.dicts_to_clusters(dicts)
    np.testing.assert_array_equal(st2.y, st.y)
    np.testing.assert_array_equal(st2.x, st.x)
    np.testing.assert_array_equal(st2.r, st.r)
