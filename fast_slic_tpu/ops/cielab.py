"""RGB -> CIELAB conversion, bit-faithful to the reference fixed-point path.

The reference converts with integer-only math (``/root/reference/src/cielab.h``):

* a 256-entry sRGB inverse-gamma LUT quantized to Q13
  (``srgb_shift = 13``, cielab.h:281,297-299),
* a 3x3 white-point-normalized RGB->XYZ matrix in Q16 (cielab.h:288-301),
* an 8193-entry cube-root ("lab nonlinearity") LUT in Q13 (cielab.h:302-304),
* L,a,b packed to uint8 with ``output_shift = 1`` (cielab.h:308-325), which in
  turn doubles the spatial coefficient via ``color_shift``
  (context.cpp:116, context.cpp:24-25).

This module precomputes the same integer LUTs with numpy (float32 arithmetic to
match the C float path) and evaluates the conversion as XLA gathers + integer
ops — exactly reproducible on TPU.  A float closed-form variant
(``rgb_to_lab_float``, mirroring ``rgb_to_cielab_orig`` cielab.h:355-397) is
kept as a readable reference and for float pipelines.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SRGB_SHIFT = 13
SRGB_MAX = 1 << SRGB_SHIFT        # 8192
LAB_SHIFT = 16
OUTPUT_SHIFT = 1                   # -> color_shift in the quantized pipeline


def _srgb_gamma_table_f32() -> np.ndarray:
    """The 256-entry linearization table (cielab.h:11-19 formula)."""
    a = np.arange(256, dtype=np.float64) / 255.0
    lin = np.where(a <= 0.04045, a / 12.92, ((a + 0.055) / 1.055) ** 2.4)
    return lin.astype(np.float32)


# RGB -> (X/Xn, Y/Yn, Z/Zn) matrix, already divided by the D65 white point
# (cielab.h:288-292).
_C_MATRIX = np.array(
    [
        [0.43395633, 0.37621531, 0.18984309],
        [0.2126729, 0.7151522, 0.072175],
        [0.01775782, 0.1094756, 0.87283638],
    ],
    dtype=np.float32,
)


def _powf_c(base: np.ndarray, exponent: float) -> np.ndarray:
    """Element-wise C ``powf`` via libm, so LUT entries match a C build
    bit-for-bit (numpy's float32 power differs by 1 ulp on ~0.3% of inputs,
    which flips ~0.016%% of LAB outputs by +-1)."""
    try:
        import ctypes
        import ctypes.util

        libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
        libm.powf.restype = ctypes.c_float
        libm.powf.argtypes = [ctypes.c_float, ctypes.c_float]
        e = np.float32(exponent)
        return np.array(
            [libm.powf(np.float32(b), e) for b in base.ravel()],
            dtype=np.float32,
        ).reshape(base.shape)
    except OSError:  # pragma: no cover - libm always present on linux
        return np.power(base.astype(np.float32), np.float32(exponent),
                        dtype=np.float32)


def _lab_nonlin_f32(v: np.ndarray) -> np.ndarray:
    """f(t) used by CIELAB: cbrt above the 0.008856 knee (cielab.h:328-332)."""
    v = v.astype(np.float32)
    lo = np.float32(7.787) * v + np.float32(0.137931)
    hi = _powf_c(v, 0.333333)
    return np.where(v > np.float32(0.008856), hi, lo)


def _build_int_tables():
    gamma_f32 = _srgb_gamma_table_f32()
    # (int)(tbl[i] * srgb_max): C truncates toward zero (cielab.h:298-299).
    srgb_tbl = np.trunc(
        (gamma_f32 * np.float32(SRGB_MAX)).astype(np.float32)
    ).astype(np.int32)
    # Cb[i] = roundf(C[i] * (1 << lab_shift)) (cielab.h:300-301).
    cb = np.round(_C_MATRIX * np.float32(1 << LAB_SHIFT)).astype(np.int32)
    # lab_tbl[i] = roundf(lab_nonlin(i / srgb_max) * srgb_max) (cielab.h:302-304).
    # roundf rounds half away from zero (values are positive: floor(x + 0.5)),
    # unlike numpy's round-half-to-even.
    idx = np.arange(SRGB_MAX + 1, dtype=np.float32) / np.float32(SRGB_MAX)
    scaled = (_lab_nonlin_f32(idx) * np.float32(SRGB_MAX)).astype(np.float32)
    lab_tbl = np.floor(scaled + np.float32(0.5)).astype(np.int32)
    return srgb_tbl, cb, lab_tbl


_SRGB_TBL_NP, _CB_NP, _LAB_TBL_NP = _build_int_tables()


def rgb_to_lab_quantized_np(image: np.ndarray) -> np.ndarray:
    """Pure-numpy oracle for the fixed-point conversion (cielab.h:308-325).

    image: uint8 [..., 3].  Returns uint8 [..., 3] packed L,a,b.
    """
    rgb = image.astype(np.int64)
    s = _SRGB_TBL_NP.astype(np.int64)[rgb]  # [..., 3]
    cb = _CB_NP.astype(np.int64)
    xr = (s @ cb[0]) >> LAB_SHIFT
    yr = (s @ cb[1]) >> LAB_SHIFT
    zr = (s @ cb[2]) >> LAB_SHIFT
    fx = _LAB_TBL_NP.astype(np.int64)[xr]
    fy = _LAB_TBL_NP.astype(np.int64)[yr]
    fz = _LAB_TBL_NP.astype(np.int64)[zr]
    ciel = 116 * fy - (16 << SRGB_SHIFT)
    ciea = 500 * (fx - fy) + (128 << SRGB_SHIFT)
    cieb = 200 * (fy - fz) + (128 << SRGB_SHIFT)
    # The C code right-shifts the *unsigned* 32-bit value (cielab.h:322-324);
    # ciel can be slightly negative (rounding), which wraps before the shift.
    sh = SRGB_SHIFT - OUTPUT_SHIFT
    u32 = np.uint64(0xFFFFFFFF)
    l8 = np.clip((ciel.astype(np.int64) & u32.astype(np.int64)) >> sh, 0, 255)
    a8 = np.clip(((ciea.astype(np.int64) & u32.astype(np.int64)) >> sh) - (64 << OUTPUT_SHIFT), 0, 255)
    b8 = np.clip(((cieb.astype(np.int64) & u32.astype(np.int64)) >> sh) - (64 << OUTPUT_SHIFT), 0, 255)
    return np.stack([l8, a8, b8], axis=-1).astype(np.uint8)


def rgb_to_lab_quantized(image: jnp.ndarray) -> jnp.ndarray:
    """XLA version of the fixed-point conversion.

    image: uint8 (or integer) array [..., 3].
    Returns int32 [..., 3] L,a,b in [0, 255] (color_shift = OUTPUT_SHIFT).

    All arithmetic is exact int32; matches :func:`rgb_to_lab_quantized_np`
    bit for bit (asserted in tests/test_cielab.py).
    """
    srgb_tbl = jnp.asarray(_SRGB_TBL_NP)
    lab_tbl = jnp.asarray(_LAB_TBL_NP)
    cb = _CB_NP  # host constants folded into the graph

    rgb = image.astype(jnp.int32)
    sr = srgb_tbl[rgb[..., 0]]
    sg = srgb_tbl[rgb[..., 1]]
    sb = srgb_tbl[rgb[..., 2]]

    def dotrow(row):
        # Products fit in int32: srgb values < 2^13, Cb < 2^16 -> < 2^29,
        # and the row sums stay under 2^31 because the matrix rows sum to ~1.0
        # in Q16.
        return (
            int(cb[row, 0]) * sr + int(cb[row, 1]) * sg + int(cb[row, 2]) * sb
        ) >> LAB_SHIFT

    xr, yr, zr = dotrow(0), dotrow(1), dotrow(2)
    fx, fy, fz = lab_tbl[xr], lab_tbl[yr], lab_tbl[zr]

    ciel = 116 * fy - (16 << SRGB_SHIFT)
    ciea = 500 * (fx - fy) + (128 << SRGB_SHIFT)
    cieb = 200 * (fy - fz) + (128 << SRGB_SHIFT)

    sh = SRGB_SHIFT - OUTPUT_SHIFT
    # Unsigned shift-with-wrap as in C (cielab.h:322-324).
    l8 = jnp.clip((ciel.astype(jnp.uint32) >> sh).astype(jnp.int32), 0, 255)
    a8 = jnp.clip((ciea.astype(jnp.uint32) >> sh).astype(jnp.int32) - (64 << OUTPUT_SHIFT), 0, 255)
    b8 = jnp.clip((cieb.astype(jnp.uint32) >> sh).astype(jnp.int32) - (64 << OUTPUT_SHIFT), 0, 255)
    return jnp.stack([l8, a8, b8], axis=-1)


def rgb_to_lab_float(image: jnp.ndarray) -> jnp.ndarray:
    """Closed-form float CIELAB (reference ``rgb_to_cielab_orig``, cielab.h:355-397).

    image: uint8 [..., 3] -> float32 [..., 3] with L in [0,100]-ish, a/b
    shifted by +128 exactly as the reference float path does.
    """
    gamma = jnp.asarray(_srgb_gamma_table_f32())
    rgb = image.astype(jnp.int32)
    r = gamma[rgb[..., 0]]
    g = gamma[rgb[..., 1]]
    b = gamma[rgb[..., 2]]
    m = _C_MATRIX
    xr = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
    yr = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
    zr = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b

    def nonlin(v):
        lo = 7.787 * v + 0.137931
        hi = jnp.power(v, 0.333333)
        return jnp.where(v > 0.008856, hi, lo)

    fx, fy, fz = nonlin(xr), nonlin(yr), nonlin(zr)
    ciel = 116.0 * fy - 16.0
    ciea = 500.0 * (fx - fy) + 128.0
    cieb = 200.0 * (fy - fz) + 128.0
    return jnp.stack([ciel, ciea, cieb], axis=-1).astype(jnp.float32)
