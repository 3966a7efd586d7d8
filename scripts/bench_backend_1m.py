"""BASELINE config #5 demonstration: a >=1M-landmark pose graph built by the
vectorized grid-hash builder and optimized with the distributed Schur
backend on an 8-device mesh.

Writes ``eval_results/backend_1m.json`` with build seconds, peak RSS,
landmark/factor counts, dropped-factor count (must be 0), and the error
trajectory.  Runs on the virtual 8-device CPU mesh (the backend is mesh-
generic; on a pod the same code shards over real chips).

``--platform tpu`` runs the SAME optimize on a single-device map mesh on
the real TPU chip (build + consensus alignment stay host-side, as in a
deployment): the sparse factor-pair Schur path fits one v5e at this scale
(obs/pair arrays are O(F); the dense [K, L] path would not), matmul
precision is pinned to HIGHEST (f32 matmuls otherwise run as bf16 MXU
passes — CLAUDE.md numerics), and the result is asserted against the
committed CPU-mesh artifact.  Writes ``eval_results/backend_1m_tpu.json``.
This also side-steps the XLA *CPU* all-reduce rendezvous stall documented
in PLAN.md — the TPU program has no CPU collectives (and at one device the
psum is the identity).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python scripts/bench_backend_1m.py [--landmarks 1000000] [--iters 4]
  python scripts/bench_backend_1m.py --platform tpu [--iters 4]
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "..", "eval_results")


def survey_world_chunked(n_landmarks, k=256, spacing=4.0, sigma_xy=0.05,
                         sigma_th=0.001, seed=0):
    """Serpentine survey like tests/test_backend_scale.survey_world, with the
    landmark->nearest-keyframes search done by GRID LOOKUP: keyframes sit on
    a regular rows x cols lattice, so each landmark's two nearest keyframes
    are among the 3x3 lattice neighborhood of its grid cell — 9 candidate
    distances per landmark instead of k (the round-3 O(n*k) chunked scan
    took 122 s at 1M landmarks / 1024 keyframes; this takes ~1 s and is
    exact for a lattice).

    Landmarks sit on a JITTERED GRID (``spacing`` ± spacing/4), which
    guarantees >= spacing/2 separation between distinct landmarks — so an
    association gate well below spacing/2 can merge the two observations of
    the SAME landmark (relative drift between its two observing keyframes,
    ~sigma_xy*sqrt(steps)) without ever merging different ones.  A uniform
    scatter has no such floor (mean NN distance 0.5/sqrt(density)); at 1M
    landmarks it forces the gate below the drift scale, every cross-row
    observation pair splits, and the graph ends up with no loop closures to
    optimize (observed: the round-3 first cut plateaued at keyframe error
    1.85 m because of exactly this).

    Returns (noisy poses [K,3], per-keyframe obs list, ground truth [K,3],
    field side length)."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n_landmarks)))
    field = side * spacing
    rows = int(np.sqrt(k))
    cols = k // rows
    gt = np.zeros((rows * cols, 3))
    for r in range(rows):
        cs = np.linspace(0.0, field, cols)
        if r % 2:
            cs = cs[::-1]
        gt[r * cols: (r + 1) * cols, 0] = cs
        gt[r * cols: (r + 1) * cols, 1] = r * field / max(rows - 1, 1)
        gt[r * cols: (r + 1) * cols, 2] = 0.0 if r % 2 == 0 else np.pi
    k = rows * cols

    gxy = np.stack(np.meshgrid(np.arange(side), np.arange(side),
                               indexing="ij"), axis=-1).reshape(-1, 2)
    lms = (gxy[:n_landmarks] * spacing + spacing / 2
           + rng.uniform(-spacing / 4, spacing / 4, (n_landmarks, 2)))
    # lattice coordinates of each landmark's containing keyframe cell; the
    # serpentine flips column order on odd rows, so map (row, col) back to
    # the keyframe index through the flip
    col_dx = field / max(cols - 1, 1)
    row_dy = field / max(rows - 1, 1)
    r0 = np.clip(np.round(lms[:, 1] / row_dy).astype(np.int64), 0, rows - 1)
    c0 = np.clip(np.round(lms[:, 0] / col_dx).astype(np.int64), 0, cols - 1)
    cand_d2 = np.full((n_landmarks, 9), np.inf)
    cand_idx = np.zeros((n_landmarks, 9), np.int64)
    col = 0
    for orr in (-1, 0, 1):
        for oc in (-1, 0, 1):
            rr = r0 + orr
            cc = c0 + oc
            ok = (rr >= 0) & (rr < rows) & (cc >= 0) & (cc < cols)
            rr_c = np.clip(rr, 0, rows - 1)
            cc_c = np.clip(cc, 0, cols - 1)
            cc_serp = np.where(rr_c % 2 == 1, cols - 1 - cc_c, cc_c)
            idx = rr_c * cols + cc_serp
            d2 = ((lms[:, 0] - gt[idx, 0]) ** 2
                  + (lms[:, 1] - gt[idx, 1]) ** 2)
            cand_d2[:, col] = np.where(ok, d2, np.inf)
            cand_idx[:, col] = idx
            col += 1
    two = np.argpartition(cand_d2, 2, axis=1)[:, :2]
    nearest2 = np.take_along_axis(cand_idx, two, axis=1)

    kf_idx = nearest2.reshape(-1)
    lm_idx = np.repeat(np.arange(n_landmarks), 2)
    dx = lms[lm_idx, 0] - gt[kf_idx, 0]
    dy = lms[lm_idx, 1] - gt[kf_idx, 1]
    r = np.hypot(dx, dy) + rng.normal(0, 0.01, len(kf_idx))
    b = np.arctan2(dy, dx) - gt[kf_idx, 2] + rng.normal(0, 1e-3, len(kf_idx))
    b = (b + np.pi) % (2 * np.pi) - np.pi

    order = np.argsort(kf_idx, kind="stable")
    counts = np.bincount(kf_idx, minlength=k)
    splits = np.cumsum(counts)[:-1]
    obs = np.split(np.stack([r, b], -1)[order], splits)

    noise = np.stack([
        rng.normal(0, sigma_xy, k), rng.normal(0, sigma_xy, k),
        rng.normal(0, sigma_th, k),
    ], axis=-1).cumsum(axis=0)
    noisy = gt + noise
    noisy[0] = gt[0]
    return noisy, obs, gt, field


def run(n_landmarks=1_000_000, k=256, iters=8, n_devices=8,
        lm_capacity=1 << 21, factor_capacity=1 << 23):
    import jax
    from jax.sharding import Mesh

    from fastslam_tpu.backend.alignment import consensus_align
    from fastslam_tpu.backend.builder import build_pose_graph
    from fastslam_tpu.backend.distributed import (
        optimize_sharded, shard_pose_graph,
    )
    from fastslam_tpu.backend.pose_graph import total_error

    devs = np.asarray(jax.devices()[:n_devices])
    assert len(devs) == n_devices, (
        f"need {n_devices} devices; start python with XLA_FLAGS="
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    platform = devs[0].platform
    mesh = Mesh(devs, ("map",))

    t0 = time.monotonic()
    noisy, obs, gt, field = survey_world_chunked(n_landmarks, k=k,
                                                 sigma_xy=0.05, seed=1)
    world_s = time.monotonic() - t0

    # Drift (up to ~1.6 m relative between cross-row keyframe pairs) vs a
    # 2 m distinct-landmark floor: no fixed gate both merges same-landmark
    # pairs and keeps distinct ones apart (the round-3 run plateaued at a
    # ~45% merge rate at gate 1.0).  Consensus alignment estimates the
    # per-keyframe drift from pairwise observation-cloud registration, so
    # association runs at the corrected poses with a TIGHT gate; the graph
    # itself still starts from the honest drifted trajectory
    # (association_poses re-projects landmark inits from it).
    t0 = time.monotonic()
    aligned, ainfo = consensus_align(noisy, obs, sigma_xy=0.05,
                                     sigma_theta=0.001)
    align_s = time.monotonic() - t0

    # factor weights = the TRUE sensor noise (a real deployment knows these
    # from odometry/sensor calibration).  At a 4 km field this matters
    # structurally: with a generic odo_sigma_theta=0.05 (50x the true
    # 0.001/step heading noise) km-wavelength bending modes of the
    # serpentine cost ~2500x too little, and the chi^2 optimum bends the
    # whole map ~1 m away from truth even with every loop closure merged
    t0 = time.monotonic()
    g = build_pose_graph(
        noisy, obs, association_poses=aligned, association_gate=0.5,
        max_landmarks=lm_capacity, max_factors=factor_capacity,
        obs_sigma_r=0.01, obs_sigma_b=1e-3,
        odo_sigma_xy=0.05, odo_sigma_theta=0.001,
    )
    build_s = time.monotonic() - t0
    n_lm = int(np.asarray(g.lm_valid).sum())
    n_f = int(np.asarray(g.obs_valid).sum())

    g8, dropped = shard_pose_graph(g, n_devices)
    err0 = float(total_error(g8.poses, g8.landmarks, g8))

    t0 = time.monotonic()
    poses, landmarks, err = optimize_sharded(g, mesh, num_iters=iters,
                                             damping=1e-3)
    jax.block_until_ready(poses)
    opt_s = time.monotonic() - t0

    from fastslam_tpu.eval.metrics import align_se2

    # keyframe error BOTH raw (shared frame) and gauge-aligned (standard
    # backend ATE: best-fit SE(2), eval/metrics.align_se2) — at a ~4 km
    # field the anchor's 1 mrad heading slack alone is metres of raw error
    # at the far end, all gauge, none of it map inconsistency
    mean_err = lambda est: float(
        np.linalg.norm(np.asarray(est)[:, :2] - gt[:, :2], axis=1).mean())
    mean_err_aligned = lambda est: float(np.linalg.norm(
        align_se2(gt[:, :2], np.asarray(est)[:, :2]) - gt[:, :2],
        axis=1).mean())
    before = mean_err(g.poses)
    before_al = mean_err_aligned(g.poses)
    aligned_err = mean_err(aligned)
    after = mean_err(poses)
    after_al = mean_err_aligned(poses)
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    return {
        "platform": platform,
        "n_landmarks_requested": n_landmarks,
        "n_landmarks_built": n_lm,
        "n_factors": n_f,
        "lm_capacity": lm_capacity,
        "factor_capacity": factor_capacity,
        "dropped_factors": int(dropped),
        "keyframes": int(np.asarray(g.poses).shape[0]),
        "n_devices": n_devices,
        "world_gen_seconds": round(world_s, 2),
        "align_seconds": round(align_s, 2),
        "align_pairs_registered": ainfo["n_registered_pairs"],
        "build_seconds": round(build_s, 2),
        "optimize_seconds": round(opt_s, 2),
        "optimize_iters": iters,
        "total_error_before": err0,
        "total_error_after": float(err),
        "mean_keyframe_error_before_m": before,
        "mean_keyframe_error_before_gauge_aligned_m": before_al,
        "mean_keyframe_error_consensus_m": aligned_err,
        "mean_keyframe_error_after_m": after,
        "mean_keyframe_error_after_gauge_aligned_m": after_al,
        "peak_rss_gb": round(peak_rss_gb, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", type=int, default=1_100_000)
    ap.add_argument("--keyframes", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--platform", choices=("cpu", "tpu"), default="cpu",
                    help="cpu: 8-device virtual mesh; tpu: single-device "
                    "map mesh on the real chip (serialize with other TPU "
                    "work — the tunnel admits one process)")
    args = ap.parse_args()

    # 8 virtual-device collectives on a 2-core box: any co-tenant load can
    # starve a device thread past XLA's default 20 s/40 s rendezvous
    # timeouts, which kills the whole process mid-optimize.  Raise them —
    # slow is fine here, dead is not.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    )

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        # the sitecustomize default (axon,cpu) already targets the chip;
        # pin matmul precision — the 3Kx3K pose-system Cholesky/solve and
        # the Schur einsums must not quantize through bf16 MXU passes
        jax.config.update("jax_default_matmul_precision", "highest")
        args.devices = 1
        assert jax.devices()[0].platform not in ("cpu",), (
            "no TPU visible; drop --platform tpu")

    out = run(args.landmarks, k=args.keyframes, iters=args.iters,
              n_devices=args.devices)
    os.makedirs(RESULTS, exist_ok=True)
    name = "backend_1m_tpu.json" if args.platform == "tpu" \
        else "backend_1m.json"
    path = os.path.join(RESULTS, name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if args.platform == "tpu":
        # parity vs the committed CPU-mesh artifact: same world (seed 1),
        # same builder output, so the optimized error must land in the
        # same place — the solve paths differ only in mesh size/platform
        cpu_path = os.path.join(RESULTS, "backend_1m.json")
        if os.path.exists(cpu_path):
            with open(cpu_path) as f:
                cpu = json.load(f)
            a, b = (out["mean_keyframe_error_after_gauge_aligned_m"],
                    cpu["mean_keyframe_error_after_gauge_aligned_m"])
            assert abs(a - b) < 0.05 + 0.25 * b, (
                f"TPU vs CPU-mesh optimize diverged: {a} vs {b}")
            print(f"parity vs CPU-mesh artifact OK: {a:.4f} vs {b:.4f}",
                  file=sys.stderr)
    assert out["dropped_factors"] == 0, "factors dropped — raise capacity"
    assert out["n_landmarks_built"] >= 1_000_000 or \
        args.landmarks < 1_000_000
    # loop closures must actually have merged: landmark count within a few
    # percent of the true count (every true landmark was observed twice; a
    # split pair inflates the count, a false merge deflates it)
    assert abs(out["n_landmarks_built"] - args.landmarks) \
        <= 0.03 * args.landmarks, out["n_landmarks_built"]
    # ...and the optimizer must actually close them: same 0.6x bar as the
    # 110k mesh test (tests/test_backend_scale.py), not a bare "any
    # epsilon".  Gauge-aligned on both sides (standard backend ATE): at
    # this field size the raw frame measures the anchor's free global
    # rotation, not map consistency — see eval/metrics.align_se2.
    assert out["mean_keyframe_error_after_gauge_aligned_m"] \
        < 0.6 * out["mean_keyframe_error_before_gauge_aligned_m"], (
        out["mean_keyframe_error_before_gauge_aligned_m"],
        out["mean_keyframe_error_after_gauge_aligned_m"])
    assert out["total_error_after"] < out["total_error_before"]


if __name__ == "__main__":
    main()
