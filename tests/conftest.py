"""Test fixture: force a virtual 8-device CPU platform so sharding /
collective paths run without TPU hardware (the JAX-native 'multi-node
without a cluster' fixture — SURVEY.md section 4).

NOTE: in this environment the axon TPU plugin ignores JAX_PLATFORMS /
XLA_FLAGS env vars, so the jax.config API is the reliable mechanism; it
must run before any backend initialization.
"""

import os

# XLA:CPU AOT cache reloads can SIGILL on pseudo machine-feature mismatches
# (see CLAUDE.md); keep the persistent compile cache TPU-only even when a
# test imports a script module whose setup_runtime() would enable it.
os.environ["MMHAND_COMPILE_CACHE"] = "0"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not marked `slow` is the smoke tier.

    `pytest -m smoke` = fast verification cycle; `pytest -m slow` = the
    long integration tail (multihost subprocesses, script-CLI interchange,
    torch parity, long pipelines); plain `pytest` = both.  Wall-times in
    CLAUDE.md."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
