"""Test configuration: force the CPU backend with 8 virtual devices.

Tests compare the XLA/Pallas pipelines against the exact numpy oracle, and
exercise multi-chip sharding on a virtual CPU mesh — all independent of real
TPU hardware (the driver's bench runs on the real chip separately).
Environment must be set before jax is imported anywhere.
"""

import os
import sys

# Force-override: the dev image presets JAX_PLATFORMS=axon (a tunneled TPU)
# and preimports jax, so we must both set the env var and update jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


# Fast tier: `pytest -m quick` runs the high-value sub-minute tests (golden
# parity vs the reference binary, CCA adversarial cases, API contracts) so
# inner-loop verification doesn't pay the full ~17-minute suite.  The two
# multi-minute outliers (LSC golden: interpret-mode Pallas feature kernels;
# the CCA store-variant A/B) stay full-suite-only.
_QUICK_FILES = {"test_golden.py", "test_cca.py", "test_api.py",
                "test_seeding.py", "test_cielab.py"}
_QUICK_EXCLUDE = {"test_golden_exact[lsc_k256]",
                  "test_pallas_strip_store_variants_identical"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (os.path.basename(str(item.fspath)) in _QUICK_FILES
                and item.name not in _QUICK_EXCLUDE):
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_image(rng, H, W, smooth=True):
    """Random test image; `smooth` gives piecewise-smooth content so
    superpixels behave naturally (pure noise makes every distance a
    near-tie)."""
    if not smooth:
        return rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    base = rng.integers(0, 256, size=(-(-H // 8), -(-W // 8), 3))
    img = np.kron(base, np.ones((8, 8, 1)))[:H, :W]
    noise = rng.integers(-10, 10, size=(H, W, 3))
    return np.clip(img + noise, 0, 255).astype(np.uint8)


@pytest.fixture
def image_factory(rng):
    return lambda H, W, **kw: make_image(rng, H, W, **kw)
