"""Configuration objects for the TPU-native SLIC pipeline.

The reference implementation (Algy/fast-slic) spreads its configuration over
three tiers: Python constructor kwargs copied onto a C++ context per call
(``/root/reference/fast_slic/base_slic.py:9-31``,
``/root/reference/cfast_slic.pyx:179-187``), environment variables
(``/root/reference/src/parallel.cpp:31-56``) and compile-time arch flags
(``/root/reference/setup.py:135-156``).

Here the same knobs split into two dataclasses:

* :class:`StaticConfig` — anything that changes the traced XLA program
  (shapes, variant, arch/backend, boolean pipeline switches).  A distinct
  ``StaticConfig`` means a distinct jit cache entry.
* :class:`RuntimeParams` — scalars that are fed into the compiled program as
  device values, so changing them never triggers recompilation
  (compactness, min_size_factor, subsample_stride, preemptive_thres,
  max_iter).
"""

from __future__ import annotations

import dataclasses
import math

# Sentinel label for "unassigned" — mirrors 0xFFFF in the reference
# (/root/reference/src/fast-slic-common.h:10, cfast_slic.pyx:259).
UNASSIGNED = 0xFFFF

# Hard cap on the number of superpixels (reference: cfast_slic.pyx:24-25).
MAX_NUM_COMPONENTS = 65534

# Distance-type variants (reference: cfast_slic.pyx:199-236 and the
# class matrix in fast_slic/base_slic.py:61-89).
VARIANT_STANDARD = "standard"   # uint16 quantized L1 (Context)
VARIANT_REAL = "real"           # float L1 (ContextRealDist)
VARIANT_REAL_L2 = "real_l2"     # float squared L2 (ContextRealDistL2)
VARIANT_REAL_NOQ = "real_noq"   # float, unquantized centroids (ContextRealDistNoQ)
VARIANT_LSC = "lsc"             # linear spectral clustering (ContextLSC)

VARIANTS = (
    VARIANT_STANDARD,
    VARIANT_REAL,
    VARIANT_REAL_L2,
    VARIANT_REAL_NOQ,
    VARIANT_LSC,
)

# Backend ("arch") names.  The reference keys kernels by CPU arch strings
# ("standard", "x64/avx2", "arm/neon"; /root/reference/src/context-impl.cpp:15-24).
# The TPU build keeps the same two-implementations-one-oracle pattern:
#   "xla"    — pure jax.numpy reference path (always available, the oracle)
#   "pallas" — fused Pallas TPU kernels (the fast arch)
# Legacy CPU arch names are accepted as aliases so reference code ports run
# unmodified.
ARCH_XLA = "xla"
ARCH_PALLAS = "pallas"

_ARCH_ALIASES = {
    "standard": ARCH_XLA,
    "x64/avx2": ARCH_PALLAS,
    "arm/neon": ARCH_PALLAS,
    ARCH_XLA: ARCH_XLA,
    ARCH_PALLAS: ARCH_PALLAS,
}


def resolve_arch(arch_name: str) -> str:
    """Map a user-facing arch name to a backend, or raise NotImplementedError.

    Mirrors ContextBuilder::is_supported_arch (cfast_slic.pyx:21-22): an
    unknown arch raises rather than silently falling back.
    """
    try:
        return _ARCH_ALIASES[arch_name]
    except KeyError:
        raise NotImplementedError("Unsupported arch " + repr(arch_name)) from None


def is_supported_arch(arch_name: str) -> bool:
    return arch_name in _ARCH_ALIASES


def get_supported_archs():
    return [ARCH_XLA, ARCH_PALLAS, "standard", "x64/avx2", "arm/neon"]


@dataclasses.dataclass(frozen=True)
class StaticConfig:
    """Trace-time configuration.  Hashable; keys the jit cache."""

    H: int
    W: int
    K: int
    variant: str = VARIANT_STANDARD
    arch: str = ARCH_XLA
    convert_to_lab: bool = True
    manhattan_spatial_dist: bool = True
    preemptive: bool = False
    float_color: bool = True       # ContextRealDistNoQ.float_color (no-op; context.h:116)
    debug_mode: bool = False
    # Cap on connected components handled on-device by CCA; more than this
    # (pathologically fragmented maps) flags a host re-run.  0 = auto-size
    # from the pixel count: raw SLIC assignments of natural images fragment
    # into roughly one component per ~50 pixels (measured ~17k on a real
    # 720p photo, K=1600), so auto allots n/24 (2x headroom, min 4096).
    # The band-guarded segment-sum (pallas/segsum_tpu.py) makes the cost of
    # a generous cap proportional to actual component density, not the cap.
    max_components: int = 0
    # Per-pixel candidate list length after visit-order compaction.  Valid
    # candidates sort to the front, so this truncates only when a 3x3 cell
    # neighborhood holds more than cand_slots active clusters (flagged, and
    # the runner escalates capacity).  Measured occupancy on grid-seeded
    # SLIC is ~9 mean / 13 max (720p K=1600 after 10 iterations), so 16
    # covers real drift; the slot count is the assign kernel's unrolled
    # inner loop length, so smaller is directly faster.
    cand_slots: int = 16
    # --- batched-canvas mode (parallel/canvas.py) ---------------------------
    # B video frames stacked vertically into one canvas of H = B*pitch rows
    # so every kernel amortizes over one tall image.  canvas_frames > 1
    # switches the pipeline to canvas semantics: frame-local visit-order
    # keys, spacer-row masking, frame-aware CCA.  S must then be pinned to
    # the per-frame value via S_fixed (the canvas aspect ratio would skew
    # the sqrt formula).
    canvas_frames: int = 1
    canvas_pitch: int = 0    # rows per frame slot (>= frame_h + S)
    canvas_frame_h: int = 0  # real rows per frame (rest is spacer)
    S_fixed: int = 0         # 0 = derive from H*W/K

    @property
    def S(self) -> int:
        """Superpixel sampling interval: S = floor(sqrt(H*W/K)), min 1.

        Reference: BaseContext constructor, /root/reference/src/context.h:60.
        Canvas mode pins the per-frame value via S_fixed.
        """
        if self.S_fixed:
            return self.S_fixed
        if self.K <= 0:
            return 1
        return max(1, int(math.sqrt(self.H * self.W // self.K)))

    @property
    def is_canvas(self) -> bool:
        # canvas semantics apply whenever a pitch is set — including a
        # one-frame-per-device shard_map canvas (spacer masking + frame-
        # aware CCA still differ from the plain single-frame path)
        return self.canvas_pitch > 0

    @property
    def effective_max_components(self) -> int:
        """Resolved CCA component cap (see max_components; 0 = auto)."""
        if self.max_components:
            return self.max_components
        n = self.H * self.W
        return min(n, max(4096, -(-(n // 24) // 128) * 128))

    @property
    def frame_K(self) -> int:
        """Clusters per frame (== K except in canvas mode)."""
        return self.K // self.canvas_frames

    @property
    def frame_max_components(self) -> int:
        """Per-frame CCA component cap: what a standalone frame of this
        canvas would resolve effective_max_components to (canvas CCA
        numbers components per frame)."""
        if not self.is_canvas:
            return self.effective_max_components
        if self.max_components:
            return max(1, self.max_components // self.canvas_frames)
        nf = self.canvas_frame_h * self.W
        return min(nf, max(4096, -(-(nf // 24) // 128) * 128))

    def __post_init__(self):
        if self.variant not in VARIANTS:
            raise RuntimeError("No such real_dist_type " + repr(self.variant))
        if self.arch not in (ARCH_XLA, ARCH_PALLAS):
            raise NotImplementedError("Unsupported arch " + repr(self.arch))
        if self.canvas_pitch or self.canvas_frames > 1:
            if not (self.S_fixed and self.canvas_pitch
                    and self.canvas_frame_h):
                raise ValueError(
                    "canvas mode requires S_fixed, canvas_pitch and "
                    "canvas_frame_h (use parallel.canvas.make_canvas_config)")
            if self.K % self.canvas_frames:
                raise ValueError("canvas K must be frames * per-frame K")
            if self.H != self.canvas_frames * self.canvas_pitch:
                raise ValueError("canvas H must be frames * pitch")
            if self.canvas_pitch < self.canvas_frame_h + self.S:
                raise ValueError("canvas pitch must leave >= S spacer rows")
            if self.variant in (VARIANT_REAL_NOQ, VARIANT_LSC):
                raise NotImplementedError(
                    "canvas mode supports quantized-centroid variants only "
                    "(standard/real/real_l2); float centroid means are not "
                    "shift-invariant bit-for-bit")


@dataclasses.dataclass
class RuntimeParams:
    """Per-call scalar parameters (device values inside the compiled step).

    Defaults mirror the *Python-side* defaults of the reference
    (fast_slic/base_slic.py:6-17); the C++-side defaults differ
    (src/context.h:26-36) but are always overwritten by the binding layer.
    """

    compactness: float = 10.0
    min_size_factor: float = 0.25
    subsample_stride: int = 3
    preemptive_thres: float = 0.05
    max_iter: int = 10
