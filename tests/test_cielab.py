"""CIELAB conversion: XLA path vs numpy fixed-point oracle, plus sanity."""

import numpy as np
import jax.numpy as jnp

from fast_slic_tpu.ops.cielab import (
    rgb_to_lab_quantized,
    rgb_to_lab_quantized_np,
    rgb_to_lab_float,
)


def test_quantized_matches_oracle_random(rng):
    img = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_lab_quantized(jnp.asarray(img)))
    ref = rgb_to_lab_quantized_np(img).astype(np.int32)
    np.testing.assert_array_equal(ours, ref)


def test_quantized_full_channel_sweep():
    # all 256 values on the gray axis + extremes of each channel
    vals = np.arange(256, dtype=np.uint8)
    gray = np.stack([vals, vals, vals], axis=-1)[None]  # [1, 256, 3]
    ours = np.asarray(rgb_to_lab_quantized(jnp.asarray(gray)))
    ref = rgb_to_lab_quantized_np(gray).astype(np.int32)
    np.testing.assert_array_equal(ours, ref)
    # gray axis: a and b stay near neutral 128 (output_shift packs 128 -> ~128)
    assert np.all(np.abs(ours[0, :, 1].astype(int) - 128) <= 3)
    assert np.all(np.abs(ours[0, :, 2].astype(int) - 128) <= 3)
    # L monotone nondecreasing along the gray axis
    assert np.all(np.diff(ours[0, :, 0]) >= 0)


def test_quantized_range_and_shift():
    img = np.array([[[0, 0, 0], [255, 255, 255]]], np.uint8)
    out = np.asarray(rgb_to_lab_quantized(jnp.asarray(img)))
    assert out.min() >= 0 and out.max() <= 255
    # white: L = 100 in CIELAB -> 200 after output_shift=1 packing
    assert abs(int(out[0, 1, 0]) - 200) <= 2


def test_float_reference_values():
    # closed-form float path: check against independently computed CIELAB
    img = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255],
                     [255, 255, 255], [0, 0, 0]]], np.uint8)
    out = np.asarray(rgb_to_lab_float(jnp.asarray(img)))
    # standard D65 values (a/b shifted +128): red L=53.2, a=80.1, b=67.2
    np.testing.assert_allclose(out[0, 0], [53.24, 80.09 + 128, 67.2 + 128],
                               atol=0.5)
    np.testing.assert_allclose(out[0, 3], [100.0, 128.0, 128.0], atol=0.5)
    np.testing.assert_allclose(out[0, 4], [0.0, 128.0, 128.0], atol=0.5)
