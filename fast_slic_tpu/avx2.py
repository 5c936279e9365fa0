"""Compat shim for ``fast_slic.avx2`` imports.

On TPU the AVX2 arch maps to the fused Pallas kernel backend
(see config._ARCH_ALIASES); these classes exist so reference user code
(`from fast_slic.avx2 import SlicAvx2`) ports with only the package rename.
"""
from .config import is_supported_arch
from .models.slic import BaseSlic, LSC

if not is_supported_arch("x64/avx2"):  # pragma: no cover - always supported
    raise ImportError(
        "fast_slic is not configured with avx2 support. "
        "Compile it again with flag USE_AVX2."
    )


class SlicAvx2(BaseSlic):
    arch_name = "x64/avx2"


class LSCAvx2(LSC):
    arch_name = "x64/avx2"
