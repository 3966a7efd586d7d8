"""Worker process for the multi-host integration test.

Launched by tests/test_multihost.py as one of N coordinated processes, each
owning 4 virtual CPU devices.  Together they form an 8-device global mesh and
run the full sharded FastSLAM step — the weight/Neff reductions and the
resampling ancestor gather cross the process (DCN-analog) boundary.  Writes
the resulting pose estimate and this process's local shard stats to a JSON
file for the parent to cross-check.
"""

import json
import os
import sys

# virtual devices must be configured before jax initializes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])
    out_path = sys.argv[4]

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core.state import init_state, pad_measurements
    from fastslam_tpu.parallel.mesh import make_mesh, state_sharding
    from fastslam_tpu.parallel.multihost import (
        initialize_distributed,
        local_shard,
        replicated_to_host,
    )
    from fastslam_tpu.parallel.sharded import make_sharded_step

    info = initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert info["global_devices"] == 4 * nproc, info

    config = FastSLAMConfig(
        num_particles=32 * nproc, max_landmarks=8, max_measurements=4
    )
    mesh = make_mesh(config)
    step = make_sharded_step(config, mesh)

    # multi-controller: host arrays cannot be device_put onto non-addressable
    # shardings — build the global state inside a jit with out_shardings (the
    # same trace runs on every process, producing one global array)
    shardings = state_sharding(mesh, config)
    make_state = jax.jit(lambda: init_state(config, rng=0),
                         out_shardings=shardings)
    state = make_state()
    ms = pad_measurements(config, [(2.0, 0.3), (3.5, -0.7)])

    poses = []
    for k in range(5):
        state, pose = step(state, jnp.float32(0.0), jnp.float32(0.4), ms)
        poses.append(np.asarray(replicated_to_host(pose)))
    jax.block_until_ready(state)

    shard = local_shard(state.poses)
    result = {
        "process_id": pid,
        "global_devices": info["global_devices"],
        "poses": np.stack(poses).tolist(),
        "local_shard_rows": int(shard.shape[0]),
        "local_shard_finite": bool(np.isfinite(shard).all()),
        "weights_sum": float(np.exp(local_shard(state.log_weights)).sum()),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
