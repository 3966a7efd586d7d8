"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding semantics are
validated on host-platform virtual devices (SURVEY.md §4).

NOTE: this container's sitecustomize registers the axon TPU plugin and
overrides the ``jax_platforms`` *config* (not just the env var) in every
Python process, so we must update the config after import — env vars alone
are clobbered.  Tests must run on CPU: the axon tunnel admits one process at
a time and concurrent users deadlock.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (sitecustomize may have imported it already)
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))  # for `oracle` imports


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full suite; ~2x the default time)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow test — run with --runslow for the full suite"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
