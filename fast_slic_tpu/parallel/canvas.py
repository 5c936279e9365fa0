"""Batched-canvas video pipeline: B frames as one tall image.

The round-1 ``vmap``-over-frames batching collapsed Pallas kernel throughput
~30x (each mapped instance ran as its own small grid).  The canvas design
batches *inside* the kernels instead: B frames are stacked vertically with a
spacer band of >= S rows between them, so every stage — CIELAB, the
assign/update loop, connected components, relabeling — runs once over a
single [B*pitch, W] image at full-grid occupancy.

Exactness (canvas labels == per-frame labels, bit-for-bit, quantized
variants):

* assignment is shift-invariant: windows (|di| <= S) cannot reach across
  the spacer (pitch >= frame_h + S), and visit-order tie keys are computed
  from frame-local coordinates (pipeline.visit_order_key, y % pitch);
* spacer pixels are masked to UNASSIGNED after every assign pass (a cluster
  window *can* cover spacer rows), so they never contribute to updates;
* centroid updates commute with the row offset exactly on quantized paths:
  the rounded integer mean satisfies
  ``(sum_y + n*off + n//2) // n == off + (sum_y + n//2) // n``
  (real_noq/LSC float means are not shift-invariant -> vmap fallback);
* row subsampling aligns because pitch % stride == 0;
* the preemptive grid aligns because pitch % 2S == 0 (when enabled);
* CCA runs frame-aware (ops.cca.enforce_connectivity_canvas_flagged).

Cluster ids on the canvas are global (frame f owns [f*K, (f+1)*K)); the
canvas height must keep B*K <= 65534 (UNASSIGNED sentinel) and
B*pitch < 2^16 (exact segment-sum value range).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..config import MAX_NUM_COMPONENTS, StaticConfig


def frame_S(H: int, W: int, K: int) -> int:
    """Per-frame sampling interval (context.h:60 semantics)."""
    if K <= 0:
        return 1
    return max(1, int(math.sqrt(H * W // K)))


def canvas_pitch(H: int, W: int, K: int, stride: int,
                 preemptive: bool = False) -> int:
    """Rows per frame slot: >= H + S spacer, aligned so per-frame row
    phases survive the stacking (subsample rows: pitch % stride == 0;
    preemptive 2S-cells: pitch % 2S == 0; 8-row sublane tidiness)."""
    S = frame_S(H, W, K)
    align = 8 * stride // math.gcd(8, stride)
    if preemptive:
        twoS = 2 * S
        align = align * twoS // math.gcd(align, twoS)
    return -(-(H + S) // align) * align


def make_canvas_config(B: int, H: int, W: int, K: int, stride: int,
                       **cfg_kwargs) -> StaticConfig:
    """StaticConfig for a B-frame canvas of HxW frames, K clusters each."""
    if B * K > MAX_NUM_COMPONENTS:
        raise ValueError(
            "canvas batch too large: B*K = %d exceeds %d (the UNASSIGNED "
            "sentinel); split the batch" % (B * K, MAX_NUM_COMPONENTS))
    pitch = canvas_pitch(H, W, K, stride,
                         cfg_kwargs.get("preemptive", False))
    CH = B * pitch
    if CH >= (1 << 16):
        raise ValueError(
            "canvas too tall: %d rows >= 2^16 (exact segment-sum value "
            "range); split the batch" % CH)
    return StaticConfig(
        H=CH, W=W, K=B * K,
        canvas_frames=B, canvas_pitch=pitch, canvas_frame_h=H,
        S_fixed=frame_S(H, W, K), **cfg_kwargs)


def build_canvas_images(images: np.ndarray, pitch: int):
    """[B, H, W, 3] -> [B*pitch, W, 3] with zeroed spacer rows."""
    B, H, W, C = images.shape
    canvas = np.zeros((B, pitch, W, C), images.dtype)
    canvas[:, :H] = images
    return canvas.reshape(B * pitch, W, C)


def crop_canvas_labels(labels, B: int, pitch: int, H: int):
    """[B*pitch, W] -> [B, H, W] (device-side reshape + slice)."""
    CH, W = labels.shape
    return labels.reshape(B, pitch, W)[:, :H, :]


def stack_cluster_state(states, pitch: int):
    """Per-frame Clusters (leading dim [B, K] each field) -> canvas Clusters
    with y offset by f*pitch and fields flattened to [B*K]."""
    import jax.numpy as jnp
    from ..cluster import Clusters
    B, K = states.y.shape
    off = (jnp.arange(B, dtype=jnp.float32) * pitch)[:, None]
    return Clusters(
        y=(states.y + off).reshape(-1),
        x=states.x.reshape(-1),
        r=states.r.reshape(-1),
        g=states.g.reshape(-1),
        b=states.b.reshape(-1),
        num_members=states.num_members.reshape(-1),
        is_active=states.is_active.reshape(-1),
        is_updatable=states.is_updatable.reshape(-1),
    )


def unstack_cluster_state(state, B: int, pitch: int):
    """Inverse of :func:`stack_cluster_state`: canvas [B*K] -> [B, K]."""
    import jax.numpy as jnp
    from ..cluster import Clusters
    K = state.y.shape[0] // B
    off = (jnp.arange(B, dtype=jnp.float32) * pitch)[:, None]
    return Clusters(
        y=state.y.reshape(B, K) - off,
        x=state.x.reshape(B, K),
        r=state.r.reshape(B, K),
        g=state.g.reshape(B, K),
        b=state.b.reshape(B, K),
        num_members=state.num_members.reshape(B, K),
        is_active=state.is_active.reshape(B, K),
        is_updatable=state.is_updatable.reshape(B, K),
    )
