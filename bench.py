"""Headline benchmark: particle updates/s/chip at 100k particles.

One "particle update" = one particle x one measurement through association +
landmark-EKF + weighting (the reference's ``__update_particle``,
``fast_slam_2.py:89-159`` — its hot inner kernel, SURVEY.md §3.6).  The
benchmark times the full jitted filter step (propagate + M measurement
updates + normalize + Neff + conditional resample + pose estimate) at
P=100,000 particles, L=64 landmark slots, M=16 measurements per tick.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the measured throughput of the NumPy oracle that transcribes the
reference's exact equations (tests/oracle/numpy_oracle.py), run on this host
— i.e. "how many times faster than the reference algorithm on CPU".

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def bench_tpu(num_steps: int = 30):
    import jax
    import jax.numpy as jnp

    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core.kernels import fastslam_step
    from fastslam_tpu.core.state import init_state, pad_measurements

    config = FastSLAMConfig(
        num_particles=100_000, max_landmarks=64, max_measurements=16
    )
    state = init_state(config, rng=0)
    ms_list = [(2.0 + 0.3 * i, -2.5 + 0.35 * i) for i in range(16)]
    ms = pad_measurements(config, ms_list)

    step = jax.jit(
        lambda st, rot, trans, m: fastslam_step(st, rot, trans, m, config)
    )

    rot = jnp.float32(0.0)
    trans = jnp.float32(0.4)

    # warmup: compile + let the landmark maps fill and weights diverge
    for _ in range(3):
        state, pose = step(state, rot, trans, ms)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(num_steps):
        state, pose = step(state, rot, trans, ms)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    updates = config.num_particles * config.max_measurements * num_steps
    return updates / dt, dt / num_steps


def bench_oracle_baseline(num_ticks: int = 2, num_particles: int = 100):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from oracle import numpy_oracle as oracle

    rng = np.random.default_rng(0)
    parts = oracle.make_particles(num_particles)
    ms = [(2.0 + 0.3 * i, -2.5 + 0.35 * i) for i in range(16)]
    # seed maps once so ticks measure the update path, not first-append
    oracle.iterate(parts, 0.0, 0.4, ms,
                   rng.normal(0, 0.001, num_particles),
                   rng.normal(0, 0.0055, num_particles),
                   0.01)
    t0 = time.perf_counter()
    for _ in range(num_ticks):
        oracle.iterate(parts, 0.0, 0.4, ms,
                       rng.normal(0, 0.001, num_particles),
                       rng.normal(0, 0.0055, num_particles),
                       0.01)
    dt = time.perf_counter() - t0
    updates = num_particles * len(ms) * num_ticks
    return updates / dt


def main():
    ups, step_s = bench_tpu()
    base_ups = bench_oracle_baseline()
    print(
        json.dumps(
            {
                "metric": "particle updates/s/chip at 100k particles",
                "value": round(ups),
                "unit": "updates/s",
                "vs_baseline": round(ups / base_ups, 2),
                "step_seconds": round(step_s, 6),
                "baseline_updates_per_s": round(base_ups),
            }
        )
    )


if __name__ == "__main__":
    main()
