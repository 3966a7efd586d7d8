"""Honest step timing: K data-dependent filter steps inside ONE jit
(lax.scan), one dispatch, one block — immune to async-dispatch accounting.

Usage: python scripts/bench_step.py [--pallas/--scan] [--k 50] ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))



def _enable_compilation_cache():
    import jax, os
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_fastslam"))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--landmarks", type=int, default=64)
    ap.add_argument("--measurements", type=int, default=16)
    ap.add_argument("--valid-measurements", type=int, default=None,
                    help="number of real (non-padded) measurements")
    ap.add_argument("--k", type=int, default=50, help="steps inside the jit")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--planes", action="store_true",
                    help="planes-native state (no per-step transposes)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16-assoc", action="store_true")
    ap.add_argument("--bf16-shadow", action="store_true",
                    help="bf16 SHADOW planes for association (converted on "
                         "writes, not per measurement)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="measurement-loop unroll factor (static trip)")
    ap.add_argument("--skip-ekf", action="store_true",
                    help="association-only timing experiment")
    ap.add_argument("--no-resample", action="store_true",
                    help="disable resampling (fixed-cost attribution)")
    ap.add_argument("--fused-only", action="store_true",
                    help="time ONLY the fused planes kernel (no propagate/"
                         "normalize/resample/estimate)")
    ap.add_argument("--no-donate", action="store_true",
                    help="disable input buffer donation on the scan jit")
    ap.add_argument("--production", action="store_true",
                    help="production math (packed-argmin association) "
                         "instead of reference-parity quirks")
    ap.add_argument("--chunk", type=int, default=0,
                    help="ticks per kernel invocation (chunked planes step; "
                         "implies --planes --production)")
    ap.add_argument("--fs2", action="store_true",
                    help="FastSLAM 2.0 measurement-informed proposal "
                         "(fused in-kernel on the planes/chunked paths; "
                         "implies --production)")
    ap.add_argument("--with-frontend", action="store_true",
                    help="end-to-end online tick: scan->measurements "
                         "frontend fused with the filter step (real "
                         "recorded simulator scans as the lax.scan xs, so "
                         "the frontend cannot be hoisted as loop-invariant)")
    args = ap.parse_args()
    if args.chunk:
        args.planes = True
        args.production = True
    if args.fs2:
        args.production = True

    import jax

    _enable_compilation_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core import kernels
    from fastslam_tpu.core.state import init_state, pad_measurements

    cfg = FastSLAMConfig(
        num_particles=args.particles, max_landmarks=args.landmarks,
        max_measurements=args.measurements, use_pallas=args.pallas,
        # Pallas kernels only run interpreted on CPU
        pallas_interpret=args.cpu and (args.pallas or args.planes),
        parity_mode=not args.production,
        proposal_mode="fastslam2" if args.fs2 else "motion",
        resample_threshold_frac=0.0 if args.no_resample else 0.5,
    )
    st = init_state(cfg, rng=0)
    n_valid = args.valid_measurements or args.measurements
    ms = pad_measurements(
        cfg, [(2.0 + 0.3 * i, -2.5 + 0.35 * i) for i in range(n_valid)]
    )

    xs = None
    if args.with_frontend:
        # end-to-end online tick: frontend + step in ONE jit, scanned over
        # REAL recorded scans (constant inputs would let XLA hoist the
        # loop-invariant frontend out of the scan and time only the step)
        from fastslam_tpu.core.state import init_planes_state
        from fastslam_tpu.drivers.replay import record_log
        from fastslam_tpu.drivers.sim_world import SimWorld
        from fastslam_tpu.frontend.pipeline import scan_to_measurements

        log = record_log(SimWorld(seed=2), num_ticks=args.k)
        values = np.asarray(log.scans, np.float32)                 # [K, B]
        nb = values.shape[1]
        angles = np.radians(np.arange(nb) - nb // 2).astype(np.float32)
        s_valid = (values >= log.min_range) & (values <= log.max_range)
        s_pts = np.stack(
            [values * np.cos(angles), values * np.sin(angles)], axis=-1
        )
        s_pts[~s_valid] = 0.0
        rots = np.where(
            np.asarray(log.cmd_v) != 0, 0.0, np.asarray(log.cmd_w) * 0.05
        ).astype(np.float32)
        trs = np.where(
            np.asarray(log.cmd_v) != 0,
            np.asarray(log.cmd_v) * 0.05 * cfg.velocity_fudge, 0.0,
        ).astype(np.float32)
        xs = (jnp.asarray(s_pts), jnp.asarray(s_valid),
              jnp.asarray(rots), jnp.asarray(trs))

        if args.planes:
            st = init_planes_state(cfg, rng=0)
            step_fn = kernels.fastslam_step_planes
        else:
            step_fn = kernels.fastslam_step

        def body(s, inp):
            pts, vld, rot, tr = inp
            m = scan_to_measurements(pts, vld, cfg)
            s, pose = step_fn(s, rot, tr, m, cfg)
            return s, pose
    elif args.chunk:
        from fastslam_tpu.core.kernels import fastslam_steps_planes_chunked
        from fastslam_tpu.core.state import Measurements, init_planes_state

        st = init_planes_state(cfg, rng=0)
        c = args.chunk
        rots = jnp.zeros(c, jnp.float32)
        trans = jnp.full(c, 0.4, jnp.float32)
        ms_c = Measurements(
            jnp.tile(ms.range_bearing[None], (c, 1, 1)),
            jnp.tile(ms.valid[None], (c, 1)),
        )

        def body(s, _):
            s, est = fastslam_steps_planes_chunked(
                s, rots, trans, ms_c, cfg, assoc_bf16=args.bf16_assoc,
                assoc_shadow=args.bf16_shadow, unroll=args.unroll,
            )
            return s, est[-1]
    elif args.planes and args.fused_only:
        from fastslam_tpu.core.pallas_kernels import fused_update_planes
        from fastslam_tpu.core.state import init_planes_state

        st = init_planes_state(cfg, rng=0)

        def body(s, _):
            logw, mx, my, ca, cb, cc, cd, cnt = fused_update_planes(
                s.poses, s.log_weights, s.lm_mx, s.lm_my, s.lm_ca, s.lm_cb,
                s.lm_cc, s.lm_cd, s.lm_count,
                ms.range_bearing, ms.valid, cfg,
                assoc_bf16=args.bf16_assoc, assoc_shadow=args.bf16_shadow,
                unroll=args.unroll, _skip_ekf=args.skip_ekf,
            )
            s = s._replace(log_weights=logw, lm_mx=mx, lm_my=my, lm_ca=ca,
                           lm_cb=cb, lm_cc=cc, lm_cd=cd, lm_count=cnt)
            return s, s.poses[0]
    elif args.planes:
        from fastslam_tpu.core.kernels import fastslam_step_planes
        from fastslam_tpu.core.state import init_planes_state

        st = init_planes_state(cfg, rng=0)

        def body(s, _):
            s, pose = fastslam_step_planes(
                s, jnp.float32(0.0), jnp.float32(0.4), ms, cfg,
                assoc_bf16=args.bf16_assoc, assoc_shadow=args.bf16_shadow,
                unroll=args.unroll, _skip_ekf=args.skip_ekf,
            )
            return s, pose
    elif args.bf16_assoc or args.skip_ekf:
        from fastslam_tpu.core.pallas_kernels import fused_update

        def body(s, _):
            logw, mean, cov, count = fused_update(
                s.poses, s.log_weights, s.lm_mean, s.lm_cov, s.lm_count,
                ms.range_bearing, ms.valid, cfg,
                assoc_bf16=args.bf16_assoc, _skip_ekf=args.skip_ekf,
            )
            s = s._replace(log_weights=logw, lm_mean=mean, lm_cov=cov,
                           lm_count=count)
            return s, s.poses[0]
    else:
        def body(s, _):
            s, pose = kernels.fastslam_step(
                s, jnp.float32(0.0), jnp.float32(0.4), ms, cfg
            )
            return s, pose

    donate = () if args.no_donate else (0,)
    if xs is not None:
        multi_xs = jax.jit(lambda s, x: jax.lax.scan(body, s, x),
                           donate_argnums=donate)
        multi = lambda s: multi_xs(s, xs)
    else:
        multi = jax.jit(lambda s: jax.lax.scan(body, s, None, length=args.k),
                        donate_argnums=donate)

    t0 = time.time()
    st2, poses = multi(st)   # donates st
    jax.block_until_ready(st2)
    compile_s = time.time() - t0

    # repeated timed region, best-of-3: sync via block_until_ready AND a
    # host readback (block_until_ready can return early on this runtime —
    # CLAUDE.md), and don't let transient co-tenant contention on the shared
    # chip define the number
    best = float("inf")
    for _ in range(1 if args.cpu else 3):
        t0 = time.perf_counter()
        st2, poses = multi(st2)
        jax.block_until_ready(st2)
        _ = np.asarray(poses[-1])
        best = min(best, time.perf_counter() - t0)
    ticks_per_scan_step = args.chunk if args.chunk else 1
    dt = best / (args.k * ticks_per_scan_step)

    print(json.dumps({
        "path": (f"chunked{args.chunk}" if args.chunk else
                 "planes" if args.planes else
                 "pallas" if args.pallas else "scan")
                + ("+frontend" if args.with_frontend else "")
                + ("+fs2" if args.fs2 else "")
                + ("+bf16" if args.bf16_assoc else "")
                + ("+noekf" if args.skip_ekf else "")
                + ("+prod" if args.production else "")
                + ("+nores" if args.no_resample else "")
                + ("+fusedonly" if args.fused_only else ""),
        "step_ms": round(dt * 1e3, 3),
        "particles": st.num_particles if args.planes else args.particles,
        "updates_per_s": round(
            (st.num_particles if args.planes else args.particles) * n_valid / dt
        ),
        "valid_measurements": n_valid,
        **({"frames_per_s": round(1 / dt, 1)} if args.with_frontend else {}),
        "compile_s": round(compile_s, 1),
        "final_pose_x": round(float(np.asarray(poses)[-1, 0]), 3),
    }))


if __name__ == "__main__":
    main()
