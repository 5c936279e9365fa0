"""fast_slic_tpu — a TPU-native superpixel framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of Algy/fast-slic
(reference mounted at /root/reference): real-time SLIC superpixel
segmentation with quantized and real-valued distance variants, LSC, graph
utilities, and a temporal mean-field CRF refiner — built as fused on-device
programs that batch over frames and shard over TPU meshes.

Top-level surface mirrors ``fast_slic/__init__.py``:
``Slic`` and friends, ``supported_archs``, ``enforce_connectivity``.
"""

from .models.slic import (  # noqa: F401
    BaseSlic,
    Slic,
    SlicRealDist,
    SlicRealDistL2,
    SlicRealDistNoQ,
    LSC,
    SlicPallas,
    LSCPallas,
)
from .model import SlicModel  # noqa: F401
from .models.crf import SimpleCRF, SimpleCRFFrame  # noqa: F401
from .ops.graph import NodeConnectivity  # noqa: F401
from .config import get_supported_archs, is_supported_arch  # noqa: F401

supported_archs = tuple(get_supported_archs())

__version__ = "0.1.0"


def enforce_connectivity(assignments, min_threshold):
    """Standalone connectivity enforcement (cfast_slic.pyx:371-396).

    assignments: int16 [H, W] label map (modified semantics: returns the
    relabeled array; also writes it back into the input array if writable,
    matching the reference's in-place behavior).  K is inferred as
    max-label + 1, scanning exactly like the reference (labels cast to
    uint16; 0xFFFF ignored).
    """
    import numpy as np
    from .config import UNASSIGNED

    arr = np.asarray(assignments)
    u = arr.astype(np.int64) & 0xFFFF
    # K inferred by scanning for the max in-range label (cfast_slic.pyx:377-382)
    labels = u[u != UNASSIGNED]
    K = int(labels.max()) + 1 if labels.size else 1

    from . import native
    if native.available():
        out = native.enforce_connectivity_native(u, K, int(min_threshold))
        out = out.astype(arr.dtype)
    else:  # pragma: no cover - g++ is present in supported environments
        from .ops.cca import enforce_connectivity_xla
        import jax.numpy as jnp
        out = np.asarray(
            enforce_connectivity_xla(jnp.asarray(u.astype(np.int32)), K,
                                     jnp.int32(min_threshold))
        ).astype(arr.dtype)
    try:
        arr[...] = out
        return arr
    except (ValueError, TypeError):
        return out
