"""Compat shim for ``fast_slic.neon`` imports (maps to the Pallas backend)."""
from .config import is_supported_arch
from .models.slic import BaseSlic, LSC

if not is_supported_arch("arm/neon"):  # pragma: no cover - always supported
    raise ImportError(
        "fast_slic is not configured with neon support. "
        "Compile it again with flag USE_NEON."
    )


class SlicNeon(BaseSlic):
    arch_name = "arm/neon"


class LSCNeon(LSC):
    arch_name = "arm/neon"
