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

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))  # for `oracle` imports
