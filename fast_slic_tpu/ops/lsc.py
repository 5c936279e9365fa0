"""LSC (Linear Spectral Clustering) feature-space ops.

Reference: ``/root/reference/src/lsc.cpp``.  LSC lifts every pixel into a
10-D feature vector [C*cos(t), C*sin(t)] for each of L, a, b, x, y (angles
proportional to the value), weights each pixel by the dot product of its
features with the image-mean feature, and runs the SLIC loop with 10-D
squared-L2 distances to per-cluster feature centroids.

The trig LUTs of the reference (256-entry color tables, per-row/col spatial
tables, lsc.cpp:66-135) are just cos/sin of quantized inputs — computed here
directly as vectorized ops; the arithmetic is float32 like the C code.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..cluster import Clusters
from ..config import StaticConfig, UNASSIGNED

C_COLOR = 20.0  # lsc.h:8


def features(planes, cfg: StaticConfig, compactness):
    """Per-pixel 10-D features + weights (map_image_into_feature_space,
    lsc.cpp:22-163).

    planes: int32 [H, W, 3] quad image.  Returns (feats f32 [H, W, 10],
    weights f32 [H, W]).  Feature order: l1,l2,a1,a2,b1,b2,x1,x2,y1,y2.
    """
    H, W, S = cfg.H, cfg.W, cfg.S
    halfPI = jnp.float32(math.pi / 2)
    c_color = jnp.float32(C_COLOR)
    ratio = compactness.astype(jnp.float32) / jnp.float32(100.0)
    c_spatial = c_color * ratio

    Lp = planes[..., 0].astype(jnp.float32)
    Ap = planes[..., 1].astype(jnp.float32)
    Bp = planes[..., 2].astype(jnp.float32)

    tL = halfPI * (Lp / 255.0)
    tA = halfPI * (Ap / 255.0)
    tB = halfPI * (Bp / 255.0)
    ti = (jnp.arange(H, dtype=jnp.float32) * (halfPI / S))[:, None]
    tj = (jnp.arange(W, dtype=jnp.float32) * (halfPI / S))[None, :]

    ones = jnp.ones([H, W], jnp.float32)
    feats = jnp.stack(
        [
            c_color * jnp.cos(tL),
            c_color * jnp.sin(tL),
            c_color * jnp.cos(tA) * 2.55,
            c_color * jnp.sin(tA) * 2.55,
            c_color * jnp.cos(tB) * 2.55,
            c_color * jnp.sin(tB) * 2.55,
            c_spatial * jnp.cos(tj) * ones,
            c_spatial * jnp.sin(tj) * ones,
            c_spatial * jnp.cos(ti) * ones,
            c_spatial * jnp.sin(ti) * ones,
        ],
        axis=-1,
    )

    mean_f = jnp.mean(feats.reshape(-1, 10), axis=0)         # lsc.cpp:138-150
    weights = feats @ mean_f                                  # lsc.cpp:151-160
    feats = feats / weights[..., None]                        # normalize_features
    return feats, weights


def seed_centroids(feats, st: Clusters, cfg: StaticConfig):
    """Centroid features = unweighted mean over the S/4 window around each
    cluster center (map_centroids_into_feature_space, lsc.cpp:165-195).

    Window sums come from a sum-pooling reduce_window (tree reduction, so no
    summed-area-table cancellation), gathered at the cluster centers.
    """
    H, W, S = cfg.H, cfg.W, cfg.S
    r = S // 4

    win = jax.lax.reduce_window(
        feats, 0.0, jax.lax.add,
        window_dimensions=(2 * r + 1, 2 * r + 1, 1),
        window_strides=(1, 1, 1),
        padding=((r, r), (r, r), (0, 0)),
    )  # [H, W, 10] clamped-window sums
    counts = jax.lax.reduce_window(
        jnp.ones([H, W], jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(2 * r + 1, 2 * r + 1),
        window_strides=(1, 1),
        padding=((r, r), (r, r)),
    )
    cy = jnp.clip(st.y.astype(jnp.int32), 0, H - 1)
    cx = jnp.clip(st.x.astype(jnp.int32), 0, W - 1)
    return win[cy, cx] / jnp.maximum(counts[cy, cx], 1.0)[:, None]


def after_update(feats, weights, st: Clusters, cent, cfg: StaticConfig,
                 rem, stride, assignment, pixel_mask=None):
    """Weighted feature re-centroid (ContextLSC::after_update,
    lsc.cpp:226-307): w-weighted segment-sum of features per cluster, then
    divide by the weight sums; non-updatable clusters keep their centroid.
    pixel_mask restricts accumulation to active preemptive tiles
    (lsc.cpp:270-287)."""
    H, W, K = cfg.H, cfg.W, cfg.K
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    mask = ((ii % stride) == rem) & (assignment != UNASSIGNED)
    if pixel_mask is not None:
        mask = mask & pixel_mask
    ids = jnp.where(mask, assignment, K).ravel()

    wf = (feats * weights[..., None]).reshape(-1, 10)
    acc = jnp.zeros([K + 1, 10], jnp.float32).at[ids].add(wf)[:K]
    wsum = jnp.zeros([K + 1], jnp.float32).at[ids].add(weights.ravel())[:K]

    upd = st.is_updatable != 0
    base = jnp.where(upd[:, None], acc, cent)
    denom = jnp.where(upd, wsum, 1.0)
    return base / denom[:, None]
