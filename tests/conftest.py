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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual-device collectives on a 2-core box: co-tenant load (or the
# suite's own second core being busy) can starve a device thread past
# XLA's default 20 s warn / 40 s TERMINATE rendezvous timeouts, which
# kills the whole pytest process as an unattributable `Fatal Python
# error` instead of failing one test.  Raise them so a genuinely stuck
# collective surfaces as ONE identifiable hanging test (killed by the
# suite's outer `timeout`), not a suite-wide abort.  (CLAUDE.md;
# scripts/bench_backend_1m.py applies the same mitigation.)
if "xla_cpu_collective_call" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = flags

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
