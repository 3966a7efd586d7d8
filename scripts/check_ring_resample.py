"""Compile + execute the Pallas ring-collective resample prototype on TPU.

This environment has ONE chip, so the ring degenerates to a self-exchange
(left = right = me); what this validates is that the kernel LOWERS through
Mosaic (remote DMA primitives, barrier/DMA semaphores, collective_id) and
that the end-to-end resample agrees bit-for-bit with the single-device
systematic resampler.  Multi-chip concurrency/barrier validation is
deferred to real multi-chip hardware (see parallel/ring_resample.py).

Prints one JSON line.  Usage: python scripts/check_ring_resample.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core import kernels
    from fastslam_tpu.core.state import init_state
    from fastslam_tpu.parallel.ring_resample import ring_halo_resample

    cfg = FastSLAMConfig(num_particles=1024, max_landmarks=16,
                         max_measurements=4)
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs[:1]), (cfg.particle_axis,))

    rng = np.random.default_rng(0)
    st = init_state(cfg, rng=0)
    w = rng.uniform(0.5, 1.5, cfg.num_particles)
    w = (w / w.sum()).astype(np.float32)
    st = st._replace(
        poses=jnp.asarray(rng.normal(0, 1, (cfg.num_particles, 3)),
                          jnp.float32),
        log_weights=jnp.log(jnp.asarray(w)),
        lm_mean=jnp.asarray(
            rng.normal(0, 3, (cfg.num_particles, cfg.max_landmarks, 2)),
            jnp.float32),
        lm_count=jnp.asarray(
            rng.integers(0, 5, cfg.num_particles), jnp.int32),
    )
    u0 = jnp.float32(0.0042)

    idx = kernels.systematic_resample_indices(jnp.exp(st.log_weights), u0)
    want = kernels.resample_state(st, idx, cfg)
    got = ring_halo_resample(st, u0, mesh, cfg)

    checks = {
        "poses": float(np.abs(np.asarray(got.poses)
                              - np.asarray(want.poses)).max()),
        "log_weights": float(np.abs(np.asarray(got.log_weights)
                                    - np.asarray(want.log_weights)).max()),
        "lm_mean": float(np.abs(np.asarray(got.lm_mean)
                                - np.asarray(want.lm_mean)).max()),
        "lm_count": int(np.abs(np.asarray(got.lm_count)
                               - np.asarray(want.lm_count)).max()),
    }
    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "ring_devices": 1,
        "max_abs_err": checks,
        "ok": all(v == 0.0 for v in checks.values()),
        "note": "1-chip ring (self-exchange); multi-chip validation "
                "deferred to real hardware",
    }))


if __name__ == "__main__":
    main()
