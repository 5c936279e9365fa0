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
import numpy as np

from ..cluster import Clusters
from ..config import StaticConfig, UNASSIGNED

C_COLOR = 20.0  # lsc.h:8


def trig_tables(cfg: StaticConfig, compactness: float):
    """Host-side trig LUTs, bit-matching the reference's tables
    (lsc.cpp:70-101).  XLA's on-device f32 cos/sin differ from libm by
    ~1e-5 — enough to flip assignment boundaries — so like the reference we
    precompute: 256-entry color tables and per-row/col spatial tables, and
    the device side only gathers.

    Returns a dict of numpy arrays (a jit-able pytree).
    """
    H, W, S = cfg.H, cfg.W, cfg.S
    halfPI = np.float32(math.pi / 2)
    c_color = np.float32(C_COLOR)
    ratio = np.float32(compactness) / np.float32(100.0)
    c_spatial = c_color * ratio

    xs = np.arange(256, dtype=np.float32)
    theta = halfPI * (xs / np.float32(255.0))
    ti = np.arange(H, dtype=np.float32) * (halfPI / np.float32(S))
    tj = np.arange(W, dtype=np.float32) * (halfPI / np.float32(S))
    return {
        "color_cos": (c_color * np.cos(theta) * np.float32(2.55)).astype(np.float32),
        "color_sin": (c_color * np.sin(theta) * np.float32(2.55)).astype(np.float32),
        "L_cos": (c_color * np.cos(theta)).astype(np.float32),
        "L_sin": (c_color * np.sin(theta)).astype(np.float32),
        "h_cos": (c_spatial * np.cos(ti)).astype(np.float32),
        "h_sin": (c_spatial * np.sin(ti)).astype(np.float32),
        "w_cos": (c_spatial * np.cos(tj)).astype(np.float32),
        "w_sin": (c_spatial * np.sin(tj)).astype(np.float32),
    }


def features(planes, cfg: StaticConfig, tables):
    """Per-pixel 10-D features + weights (map_image_into_feature_space,
    lsc.cpp:22-163).

    planes: int32 [3, H, W] planar quad image.  tables: trig LUTs from
    :func:`trig_tables`.  Returns (feats f32 PLANAR [10, H, W], weights f32
    [H, W]).  Feature order: l1,l2,a1,a2,b1,b2,x1,x2,y1,y2.  Planar is the
    layout every consumer wants (padded kernel planes, row-layout float
    segment sums); the old [H, W, 10] form cost an 83 MB relayout at 1080p
    before the loop and a 30 MB transpose per after_update.
    """
    H, W = cfg.H, cfg.W
    t = {k: jnp.asarray(v) for k, v in tables.items()}

    ones = jnp.ones([H, W], jnp.float32)
    if jax.default_backend() == "tpu":
        # fused LUT kernel: the six XLA table gathers execute serially
        # (~8 ns/element — ~100 ms at 1080p)
        from ..pallas.lut_tpu import lsc_color_feats_pallas
        color6 = lsc_color_feats_pallas(
            planes, tables["L_cos"], tables["L_sin"],
            tables["color_cos"], tables["color_sin"])
        color_parts = [color6[i] for i in range(6)]
    else:
        Lp = planes[0]
        Ap = planes[1]
        Bp = planes[2]
        color_parts = [
            t["L_cos"][Lp], t["L_sin"][Lp],
            t["color_cos"][Ap], t["color_sin"][Ap],
            t["color_cos"][Bp], t["color_sin"][Bp],
        ]
    feats = jnp.stack(
        color_parts + [
            t["w_cos"][None, :] * ones,
            t["w_sin"][None, :] * ones,
            t["h_cos"][:, None] * ones,
            t["h_sin"][:, None] * ones,
        ],
        axis=0,
    )                                                          # [10, H, W]

    mean_f = jnp.mean(feats.reshape(10, -1), axis=1)          # lsc.cpp:138-150
    weights = jnp.einsum("chw,c->hw", feats, mean_f)          # lsc.cpp:151-160
    feats = feats / weights[None]                             # normalize_features
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
        window_dimensions=(1, 2 * r + 1, 2 * r + 1),
        window_strides=(1, 1, 1),
        padding=((0, 0), (r, r), (r, r)),
    )  # [10, H, W] clamped-window sums
    counts = jax.lax.reduce_window(
        jnp.ones([H, W], jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(2 * r + 1, 2 * r + 1),
        window_strides=(1, 1),
        padding=((r, r), (r, r)),
    )
    cy = jnp.clip(st.y.astype(jnp.int32), 0, H - 1)
    cx = jnp.clip(st.x.astype(jnp.int32), 0, W - 1)
    # flat 1-D gathers (2-D advanced indexing serializes on TPU)
    flat = cy * W + cx
    picked = jnp.transpose(win.reshape(10, -1)[:, flat])       # [K, 10]
    cnt = counts.reshape(-1)[flat]
    return picked / jnp.maximum(cnt, 1.0)[:, None]


def after_update(feats, weights, st: Clusters, cent, cfg: StaticConfig,
                 rem, stride, assignment, pixel_mask=None,
                 assignment_sub=None, pixel_mask_sub=None):
    """Weighted feature re-centroid (ContextLSC::after_update,
    lsc.cpp:226-307): w-weighted segment-sum of features per cluster, then
    divide by the weight sums; non-updatable clusters keep their centroid.
    pixel_mask restricts accumulation to active preemptive tiles
    (lsc.cpp:270-287).  The resident-subsampled loop passes the already-
    sliced assignment/mask via assignment_sub/pixel_mask_sub (rows are
    absolute rows rem::stride, exactly [ceil((H-rem)/stride), W])."""
    H, W, K = cfg.H, cfg.W, cfg.K

    # subsample-slice the rows like update_xla: only rows == rem (mod
    # stride) contribute, so the accumulation reads 1/stride of the image
    if assignment_sub is not None:
        feats_s = feats[:, rem::stride]
        weights_s = weights[rem::stride]
        asg_s = assignment_sub
        pm_s = pixel_mask_sub
    elif isinstance(stride, int) and stride > 1 and isinstance(rem, int):
        feats_s = feats[:, rem::stride]
        weights_s = weights[rem::stride]
        asg_s = assignment[rem::stride]
        pm_s = pixel_mask[rem::stride] if pixel_mask is not None else None
    else:
        ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        row_ok = (ii % stride) == rem
        feats_s, weights_s, asg_s = feats, weights, assignment
        pm_s = (row_ok if pixel_mask is None else (row_ok & pixel_mask))
    # w-weighted feature sums per cluster (TPU scatters serialize; the
    # unguarded one-hot einsum costs ~7 ms/iteration at 1080p).
    # Accumulation is f32 like the reference's thread-local float
    # accumulators (lsc.cpp:245-297).
    acc11 = after_update_acc(feats_s, weights_s, asg_s, pm_s, K)
    return after_update_apply(acc11, st, cent)


def after_update_apply(acc11, st: Clusters, cent):
    """The means half of after_update: centroid = weighted sums / weight
    sums for updatable clusters (lsc.cpp:299-307).  Spatial shards psum
    their local acc11 [K+1, 11] first."""
    K = st.K
    acc = acc11[:K, :10]
    wsum = acc11[:K, 10]

    upd = st.is_updatable != 0
    base = jnp.where(upd[:, None], acc, cent)
    denom = jnp.where(upd, wsum, 1.0)
    return base / denom[:, None]


def after_update_acc(feats_s, weights_s, asg_s, pm_s, K: int):
    """The reduction half of after_update for pre-sliced local inputs:
    feats_s PLANAR f32 [10, Hs, W].  Returns f32 [K+1, 11] weighted feature
    sums (+ weight sums) of this array's pixels.  Spatial shards psum and
    then call after_update_apply — the collective analog of the reference's
    thread-local float accumulators + critical merge (lsc.cpp:245-297).
    The planar layout feeds the row-layout float segment-sum directly (the
    old interleaved form paid a [N, 11] transpose per iteration — 30 MB of
    relayout at 1080p)."""
    mask = asg_s != UNASSIGNED
    if pm_s is not None:
        mask = mask & pm_s
    ids = jnp.where(asg_s != UNASSIGNED, asg_s, K).ravel()
    if jax.default_backend() == "tpu":
        # weight multiply fused into the kernel (wrow=10): the raw feature
        # rows + the weight row go in, w*f products never touch HBM
        from ..pallas.segsum_tpu import float_segsum_pallas
        vals = jnp.concatenate(
            [feats_s.reshape(10, -1), weights_s.reshape(1, -1)], axis=0)
        return jnp.transpose(float_segsum_pallas(
            ids, mask.astype(jnp.int32).ravel(), vals, K, False, wrow=10))
    wfeats = feats_s * weights_s[None]                      # [10, Hs, W]
    vals = jnp.concatenate(
        [wfeats.reshape(10, -1), weights_s.reshape(1, -1)], axis=0)
    wf = jnp.transpose(vals) * mask.astype(jnp.float32).ravel()[:, None]
    ids_m = jnp.where(mask.ravel(), ids, K)
    tile = 4096
    N = wf.shape[0]
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    ids_p = jnp.concatenate([ids_m, jnp.full([pad], K, ids.dtype)])
    wf_p = jnp.concatenate([wf, jnp.zeros([pad, 11], wf.dtype)])
    oh = (ids_p.reshape(n_tiles, tile)[..., None]
          == jnp.arange(K + 1, dtype=ids.dtype)).astype(jnp.float32)
    return jnp.einsum("btk,btv->kv", oh, wf_p.reshape(n_tiles, tile, 11),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def features_sharded(planes_l, cfg: StaticConfig, tables, row0, Hl: int,
                     axis_name: str, n_shards: int):
    """Row-sharded :func:`features`: planes_l int32 [3, Hl, W] holds GLOBAL
    rows [row0, row0+Hl); the image-mean feature (lsc.cpp:138-150) is a
    psum of local sums.  Returns PLANAR feats [10, Hl, W].  Agreement with
    the single-device path is tolerance-level (f32 reduction order
    differs), matching the LSC parity contract."""
    H, W = cfg.H, cfg.W
    t = {k: jnp.asarray(v) for k, v in tables.items()}
    ones = jnp.ones([Hl, W], jnp.float32)
    if jax.default_backend() == "tpu":
        from ..pallas.lut_tpu import lsc_color_feats_pallas
        color6 = lsc_color_feats_pallas(
            planes_l, tables["L_cos"], tables["L_sin"],
            tables["color_cos"], tables["color_sin"])
        color_parts = [color6[i] for i in range(6)]
    else:
        Lp, Ap, Bp = planes_l[0], planes_l[1], planes_l[2]
        color_parts = [
            t["L_cos"][Lp], t["L_sin"][Lp],
            t["color_cos"][Ap], t["color_sin"][Ap],
            t["color_cos"][Bp], t["color_sin"][Bp],
        ]
    h_cos = jax.lax.dynamic_slice(t["h_cos"], (row0,), (Hl,))
    h_sin = jax.lax.dynamic_slice(t["h_sin"], (row0,), (Hl,))
    feats = jnp.stack(
        color_parts + [
            t["w_cos"][None, :] * ones,
            t["w_sin"][None, :] * ones,
            h_cos[:, None] * ones,
            h_sin[:, None] * ones,
        ],
        axis=0,
    )                                                      # [10, Hl, W]
    local_sum = jnp.sum(feats.reshape(10, -1), axis=1)
    mean_f = jax.lax.psum(local_sum, axis_name) / jnp.float32(H * W)
    weights = jnp.einsum("chw,c->hw", feats, mean_f)
    feats = feats / weights[None]
    return feats, weights


def seed_centroids_sharded(feats_l, st: Clusters, cfg: StaticConfig, row0,
                           Hl: int, axis_name: str, n_shards: int):
    """Row-sharded :func:`seed_centroids`: the S/4 windows cross shard
    seams, so each shard extends its slab with r halo rows exchanged by
    ppermute (zeros at the global edges — exactly the reduce_window
    zero-padding of the single-device path), computes valid-row window
    sums, and the owner shard of each center contributes its value,
    merged by psum."""
    H, W, S = cfg.H, cfg.W, cfg.S
    r = S // 4
    d = jax.lax.axis_index(axis_name)
    up = [(i, i + 1) for i in range(n_shards - 1)]
    down = [(i + 1, i) for i in range(n_shards - 1)]
    if r > 0:
        above = jax.lax.ppermute(feats_l[:, -r:], axis_name, up)
        below = jax.lax.ppermute(feats_l[:, :r], axis_name, down)
        above = jnp.where(d > 0, above, jnp.zeros_like(above))
        below = jnp.where(d < n_shards - 1, below, jnp.zeros_like(below))
        ext = jnp.concatenate([above, feats_l, below], axis=1)
    else:
        ext = feats_l
    win = jax.lax.reduce_window(
        ext, 0.0, jax.lax.add,
        window_dimensions=(1, 2 * r + 1, 2 * r + 1),
        window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (r, r)),
    )  # [10, Hl, W]
    # clamped-window counts in closed form (== reduce_window of ones)
    cy = jnp.clip(st.y.astype(jnp.int32), 0, H - 1)
    cx = jnp.clip(st.x.astype(jnp.int32), 0, W - 1)
    rows_in = (jnp.minimum(cy + r, H - 1) - jnp.maximum(cy - r, 0) + 1)
    cols_in = (jnp.minimum(cx + r, W - 1) - jnp.maximum(cx - r, 0) + 1)
    counts = (rows_in * cols_in).astype(jnp.float32)
    owns = (cy >= row0) & (cy < row0 + Hl)
    ly = jnp.clip(cy - row0, 0, Hl - 1)
    picked = jnp.where(owns[:, None],
                       jnp.transpose(win.reshape(10, -1)[:, ly * W + cx]),
                       0.0)
    total = jax.lax.psum(picked, axis_name)
    return total / jnp.maximum(counts, 1.0)[:, None]
