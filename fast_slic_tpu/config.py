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
    # Max clusters stored per candidate cell.  Each pixel considers the 3x3
    # neighborhood of its S-cell, i.e. 9*cell_capacity candidate clusters.
    # Seeding places ~1 cluster per cell, so 4 is a generous safety factor.
    cell_capacity: int = 4
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
    # neighborhood holds more than cand_slots active clusters (flagged).
    cand_slots: int = 24

    @property
    def S(self) -> int:
        """Superpixel sampling interval: S = floor(sqrt(H*W/K)), min 1.

        Reference: BaseContext constructor, /root/reference/src/context.h:60.
        """
        if self.K <= 0:
            return 1
        return max(1, int(math.sqrt(self.H * self.W // self.K)))

    @property
    def effective_max_components(self) -> int:
        """Resolved CCA component cap (see max_components; 0 = auto)."""
        if self.max_components:
            return self.max_components
        n = self.H * self.W
        return min(n, max(4096, -(-(n // 24) // 128) * 128))

    def __post_init__(self):
        if self.variant not in VARIANTS:
            raise RuntimeError("No such real_dist_type " + repr(self.variant))
        if self.arch not in (ARCH_XLA, ARCH_PALLAS):
            raise NotImplementedError("Unsupported arch " + repr(self.arch))


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
