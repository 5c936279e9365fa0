"""Explicit shard_map spatial parallelism (parallel/spatial_shardmap.py).

VERDICT.md round-1 item 7: the hand-written ppermute-halo + psum path must
(a) bit-match the single-device pipeline on the 8-device CPU mesh and
(b) compile to collective-permutes for the halo exchange — NOT all-gathers
of pixel-sized arrays (the GSPMD fallback this module exists to avoid).
Seam-correct CCA mirrors the reference's row-band union-find seam merge
(/root/reference/src/cca.cpp:89-99).
"""

import re

import numpy as np
import pytest

import jax

from fast_slic_tpu import Slic
from fast_slic_tpu.models.slic import (SlicRealDist, SlicRealDistL2,
                                       SlicRealDistNoQ, LSC)
from fast_slic_tpu.parallel.mesh import make_mesh
from fast_slic_tpu.parallel.spatial_shardmap import ShardedSlicExplicit

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs8
@pytest.mark.parametrize("variant,single_cls,exact", [
    ("standard", Slic, True),
    ("real", SlicRealDist, True),
    ("real_l2", SlicRealDistL2, True),
    ("real_noq", SlicRealDistNoQ, True),
    # LSC: the psum'd image-mean feature's f32 reduction order differs
    # from the single-device mean -> tolerance-level agreement (the same
    # contract as the LSC golden tests)
    ("lsc", LSC, False),
])
def test_explicit_spatial_matches_single(image_factory, variant, single_cls,
                                         exact):
    H, W, K = 64, 64, 9
    img = image_factory(H, W)
    mesh = make_mesh(8, data=1, space=8)
    sharded = ShardedSlicExplicit(num_components=K, min_size_factor=0.1,
                                  variant=variant, mesh=mesh)
    labels = np.asarray(sharded.iterate(img, max_iter=3))
    assert labels.dtype == np.int16  # Slic.iterate API contract
    ref = single_cls(num_components=K, min_size_factor=0.1).iterate(
        img, max_iter=3)
    if exact:
        np.testing.assert_array_equal(labels, np.asarray(ref))
    else:
        agree = (labels == np.asarray(ref)).mean()
        assert agree >= 0.99, agree


@needs8
def test_explicit_spatial_preemptive_matches_single(image_factory):
    H, W, K = 64, 64, 9
    img = image_factory(H, W)
    mesh = make_mesh(8, data=1, space=8)
    sharded = ShardedSlicExplicit(num_components=K, min_size_factor=0.1,
                                  preemptive=True, mesh=mesh)
    labels = np.asarray(sharded.iterate(img, max_iter=4))
    single = Slic(num_components=K, min_size_factor=0.1, preemptive=True)
    ref = single.iterate(img, max_iter=4)
    np.testing.assert_array_equal(labels, np.asarray(ref))


@needs8
def test_explicit_spatial_warm_start(image_factory):
    H, W, K = 64, 64, 9
    img = image_factory(H, W)
    mesh = make_mesh(8, data=1, space=8)
    sharded = ShardedSlicExplicit(num_components=K, min_size_factor=0.1,
                                  mesh=mesh)
    sharded.iterate(img, max_iter=2)
    labels2 = np.asarray(sharded.iterate(img, max_iter=2))

    single = Slic(num_components=K, min_size_factor=0.1)
    single.iterate(img, max_iter=2)
    ref2 = single.iterate(img, max_iter=2)
    np.testing.assert_array_equal(labels2, np.asarray(ref2))


@needs8
def test_explicit_spatial_uses_ppermute_not_allgather(image_factory):
    """Halos must ride collective-permute; all-gather is only acceptable on
    cluster/scalar-sized arrays (the [D] leader-count exchange), never on
    pixel-sized ones."""
    from fast_slic_tpu.parallel import spatial_shardmap as ssm
    from fast_slic_tpu import pipeline as pl
    from fast_slic_tpu.config import StaticConfig

    H, W, K = 64, 64, 9
    mesh = make_mesh(8, data=1, space=8)
    cfg = StaticConfig(H=H, W=W, K=K, variant="standard", arch="xla",
                       convert_to_lab=True)
    fn = ssm._compiled_spatial_explicit(cfg, 2, 3, mesh, H // 8)

    import jax.numpy as jnp
    from fast_slic_tpu import cluster as cl
    img = image_factory(H, W)
    st = jax.tree.map(jnp.asarray, cl.initialize_clusters(img, K))
    scalars = pl.derive_scalars(cfg, 10.0, 0.1, 0.05)
    hlo = fn.lower(jnp.asarray(img), st, scalars).compile().as_text()

    assert "collective-permute" in hlo
    # any all-gather operand must be small (≤ 64·K elements ~ cluster state)
    pixel_elems = (H // 8) * W
    for m in re.finditer(r"all-gather\(", hlo):
        line = hlo[:m.start()].rsplit("\n", 1)[-1] + hlo[m.start():].split(
            "\n", 1)[0]
        shapes = re.findall(r"(?:f32|s32|u32|pred|s8|u8|bf16)\[([\d,]*)\]",
                            line)
        for s in shapes:
            n = int(np.prod([int(d) for d in s.split(",") if d] or [1]))
            assert n < pixel_elems, (
                "pixel-sized all-gather in explicit spatial path:\n" + line)
