"""Accuracy evaluation matrix -> EVAL.md.

Runs the engine over a grid of worlds (seeds), particle counts, and modes
(reference-oracle / parity / production / production+fastslam2 / +ICP), and
writes a markdown report with ATE RMSE per cell.  This is the standing
accuracy evidence for the north-star bound ("match reference ATE").

Usage: python scripts/eval_suite.py --cpu --out EVAL.md
"""

import argparse
import json
import os
import sys
from datetime import date

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="EVAL.md")
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--seeds", type=int, nargs="+", default=[3, 7, 21])
    ap.add_argument("--oracle-particles", type=int, default=50)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fastslam_tpu.app.runner import run_driver
    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.drivers.replay import ReplayDriver, record_log
    from fastslam_tpu.drivers.sim_world import SimWorld
    from fastslam_tpu.eval.metrics import ate_rmse
    from oracle_ate import run_oracle

    modes = {
        "parity (N=100)": dict(num_particles=100),
        "parity (N=1000)": dict(num_particles=1000),
        "production (N=100)": dict(num_particles=100, parity_mode=False),
        "production+fs2 (N=100)": dict(
            num_particles=100, parity_mode=False, proposal_mode="fastslam2"
        ),
        "production+icp (N=100)": dict(
            num_particles=100, parity_mode=False, use_icp_proposal=True,
        ),
        # adaptive floors, residual-only ICP (blend 0: exact sim commands
        # must not be polluted by scan-match noise)
        "production+fs2+adaptive (N=100)": dict(
            num_particles=100, parity_mode=False, proposal_mode="fastslam2",
            use_icp_proposal=True, icp_blend=0.0,
            adaptive_proposal_floors=True,
        ),
    }
    # the chunked batch-replay engine (the headline-bench path): resampling
    # at chunk boundaries instead of per tick
    chunked_name = "production chunked C=8 (N=100)"
    # wheel-slip rows: corrupt the odometry the filter sees (rotation std,
    # translation std per tick; ground truth unaffected).  This is where the
    # ICP scan-match proposal earns its keep — command odometry is nearly
    # exact in the clean sim, so ICP can only help under slip.
    slip = (0.02, 0.02)
    slip_modes = {
        "production (N=100, wheel slip)": dict(num_particles=100,
                                               parity_mode=False),
        "production+icp (N=100, wheel slip)": dict(
            num_particles=100, parity_mode=False, use_icp_proposal=True,
        ),
        # adaptive floors under slip: ICP blended in (it beats slipping
        # commands) AND the floors open to the slip scale online
        "production+fs2+adaptive (N=100, wheel slip)": dict(
            num_particles=100, parity_mode=False, proposal_mode="fastslam2",
            use_icp_proposal=True, icp_blend=0.5,
            adaptive_proposal_floors=True,
        ),
    }

    # the sim world is deterministic; vary runs by start pose + range noise
    starts = {s: (0.35 * (i - 1), -0.3 * i, 0.4 * i)
              for i, s in enumerate(args.seeds)}

    rows = {name: []
            for name in list(modes) + [chunked_name] + list(slip_modes)}
    oracle_row = []
    for seed in args.seeds:
        x0, y0, yaw0 = starts[seed]
        log = record_log(
            SimWorld(seed=seed, x=x0, y=y0, yaw=yaw0, range_noise_std=0.005),
            num_ticks=args.ticks,
        )
        # full SE(2) alignment of ground truth into the start frame
        p0 = log.gt_poses[0]
        c0, s0 = np.cos(-p0[2]), np.sin(-p0[2])
        d = log.gt_poses - p0
        gt = np.stack([c0 * d[:, 0] - s0 * d[:, 1],
                       s0 * d[:, 0] + c0 * d[:, 1],
                       d[:, 2]], axis=-1)

        cfg_oracle = FastSLAMConfig(
            num_particles=args.oracle_particles, max_landmarks=64,
            warmup_iterations=150,
        )
        est = run_oracle(log, cfg_oracle, seed=0)
        oracle_row.append(ate_rmse(gt[:, :2], est[:, :2]))

        for name, overrides in modes.items():
            cfg = FastSLAMConfig(
                max_landmarks=64, warmup_iterations=150, **overrides
            )
            hist = run_driver(ReplayDriver(log), cfg, rng=0)
            est = np.asarray(hist.est_poses)
            rows[name].append(ate_rmse(gt[:, :2], est[:, :2]))

        from fastslam_tpu.app.runner import replay_chunked

        chunk_cfg = FastSLAMConfig(
            num_particles=100, max_landmarks=64, warmup_iterations=150,
            parity_mode=False, use_pallas=True, pallas_interpret=args.cpu,
        )
        hist = replay_chunked(log, chunk_cfg, chunk_size=8, rng=0)
        rows[chunked_name].append(
            ate_rmse(gt[:, :2], np.asarray(hist.est_poses)[:, :2])
        )

        for name, overrides in slip_modes.items():
            cfg = FastSLAMConfig(
                max_landmarks=64, warmup_iterations=150, **overrides
            )
            hist = run_driver(ReplayDriver(log), cfg, rng=0,
                              odometry_noise=slip)
            est = np.asarray(hist.est_poses)
            rows[name].append(ate_rmse(gt[:, :2], est[:, :2]))

    lines = [
        "# EVAL — accuracy matrix",
        "",
        f"Generated {date.today().isoformat()} by `scripts/eval_suite.py` "
        f"({args.ticks}-tick synthetic-world logs, warmup 150; ATE RMSE in "
        "metres over the full trajectory).",
        "",
        "| pipeline | " + " | ".join(f"seed {s}" for s in args.seeds) + " | mean |",
        "|---|" + "---|" * (len(args.seeds) + 1),
    ]

    def fmt(vals):
        return " | ".join(f"{v:.3f}" for v in vals) + f" | **{np.mean(vals):.3f}**"

    lines.append(
        f"| reference equations (NumPy oracle, N={args.oracle_particles}) | "
        + fmt(oracle_row) + " |"
    )
    for name, vals in rows.items():
        lines.append(f"| {name} | " + fmt(vals) + " |")

    lines += [
        "",
        "The north-star accuracy bound is \"match reference ATE\": every engine",
        "configuration must be at or below the oracle row.",
        "",
        "Notes: parity mode reproduces the reference's algorithm faithfully,",
        "including the quirks that degrade with particle count (weights kept",
        "after resampling, the <1e-5 normalization skip, argmax-weight pose",
        "estimate) — hence parity N=1000 is not better than N=100.  The fs2",
        "proposal's floors default to real-robot odometry error (0.01); on",
        "these near-exact-odometry sim logs tighter floors close the gap",
        "(0.0003 -> 0.017 on seed 3), and under wheel slip fs2/ICP beat the",
        "motion-only proposal (the slip rows).  The `+adaptive` rows estimate",
        "the floors ONLINE from the ICP-vs-command residual — one config for",
        "both regimes (clean rows use icp_blend=0, residual-only; slip rows",
        "blend the scan match in).  The `chunked C=8` row is the headline-",
        "bench batch-replay engine (resampling at chunk boundaries; ~1.3x",
        "throughput for a small ATE cost vs per-tick production).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({
        "oracle_mean": round(float(np.mean(oracle_row)), 4),
        **{k: round(float(np.mean(v)), 4) for k, v in rows.items()},
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
