"""Multi-host integration: the full sharded step under jax.distributed.

Spawns two coordinated CPU processes (4 virtual devices each -> an 8-device
global mesh) and runs five sharded filter steps.  This exercises the real
multi-controller path — cross-process collectives for weight normalization /
Neff / pose argmax and the cross-process resampling gather — which the
single-process 8-device tests (test_sharded.py) cannot: there, every shard is
addressable and no coordination service exists.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_step(tmp_path):
    nproc = 2
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"out_{i}.json") for i in range(nproc)]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), str(nproc), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(nproc)
    ]
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=240)
        assert p.returncode == 0, (
            f"worker failed:\n{stdout.decode()[-2000:]}\n{stderr.decode()[-2000:]}"
        )
        with open(out) as f:
            results.append(json.load(f))

    a, b = results
    assert a["global_devices"] == b["global_devices"] == 8
    # pose estimate is replicated: every process must see the same trajectory
    np.testing.assert_allclose(a["poses"], b["poses"], rtol=1e-6, atol=1e-6)
    assert np.isfinite(np.asarray(a["poses"])).all()
    # each process holds exactly its half of the particle axis
    assert a["local_shard_rows"] == b["local_shard_rows"] == 32
    assert a["local_shard_finite"] and b["local_shard_finite"]
    # normalized weights: the two halves sum to 1 globally
    total = a["weights_sum"] + b["weights_sum"]
    assert total == pytest.approx(1.0, abs=1e-3)
