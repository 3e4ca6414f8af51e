"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container boots a sitecustomize that registers the axon TPU backend and
forces jax_platforms=axon programmatically, so the env var alone is not
enough — we flip the config back to CPU right after import (before any
computation traces). XLA_FLAGS must still be set before jax initializes its
backends to get the 8 virtual CPU devices used by the sharding tests
(SURVEY.md §4: multi-host tests on a single host via virtual devices).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests"
    )
