"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set the platform env vars before jax is imported anywhere, so this
conftest performs the setup at import time (pytest imports conftest first).
"""

import os
import sys

# Force CPU: the session env pins JAX_PLATFORMS=axon (the tunneled real TPU),
# which would run eager test code op-by-op over the network. The axon plugin
# ignores the env var, so set the jax config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must import after the env setup above)

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compile cache: the big train-step graphs take minutes to
# compile on CPU; cache them across test runs (keyed by platform+flags, so
# CPU test entries don't collide with TPU entries).
from styletts2_tpu.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

REFERENCE_ROOT = "/root/reference"

# ---------------------------------------------------------------------------
# Test tiers (see pytest.ini): `-m quick` = minutes on 1 CPU; `-m slow` =
# the four multi-minute-compile files; no flag = everything.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

QUICK_MODULES = {
    "test_text", "test_config", "test_align", "test_stft", "test_layers",
    "test_data", "test_tools", "test_audio_formats", "test_denoise",
    "test_quick_e2e", "test_golden_fixtures", "test_tb_events",
}
SLOW_MODULES = {
    # test_serve_http demoted from quick in round 5 (the HTTP integration
    # spins a real engine + server; the engine paths it drives are covered
    # by test_quick_e2e) to keep `-m quick` under ~5 min on a 1-core host
    "test_train_step", "test_parallel", "test_composed_parity",
    "test_slm_train", "test_train_cli", "test_serve_http",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        # an explicit @pytest.mark.slow on a test inside a quick module
        # demotes just that test
        if mod in QUICK_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    """Make the (read-only, untrusted) reference importable for golden-value
    parity tests. Only its numeric behavior is consulted."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
