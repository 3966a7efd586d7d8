"""Compare the lax.scan vs fused-Pallas measurement update on the current
JAX platform (TPU under the default env; CPU with --cpu)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--landmarks", type=int, default=64)
    ap.add_argument("--measurements", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", choices=["scan", "pallas"], default=None)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core import kernels
    from fastslam_tpu.core.state import init_state, pad_measurements

    variants = {"scan": (False,), "pallas": (True,)}.get(args.only, (False, True))
    for use_pallas in variants:
        cfg = FastSLAMConfig(
            num_particles=args.particles,
            max_landmarks=args.landmarks,
            max_measurements=args.measurements,
            use_pallas=use_pallas,
        )
        st = init_state(cfg, rng=0)
        ms = pad_measurements(
            cfg,
            [(2.0 + 0.3 * i, -2.5 + 0.35 * i) for i in range(args.measurements)],
        )
        step = jax.jit(lambda s, r, t, m, c=cfg: kernels.fastslam_step(s, r, t, m, c))

        t0 = time.time()
        for _ in range(3):
            st, pose = step(st, jnp.float32(0.0), jnp.float32(0.4), ms)
        jax.block_until_ready(st)
        compile_s = time.time() - t0

        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, pose = step(st, jnp.float32(0.0), jnp.float32(0.4), ms)
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / args.steps

        ups = args.particles * args.measurements / dt
        print(
            f"pallas={use_pallas}: step={dt*1e3:.2f}ms  updates/s={ups:,.0f}  "
            f"(compile+warm {compile_s:.1f}s)  pose={np.asarray(pose).round(4)}  "
            f"lm_count[0]={int(st.lm_count[0])}"
        )


if __name__ == "__main__":
    main()
