"""Headline benchmark: particle updates/s/chip at 100k particles.

One "particle update" = one particle x one measurement through association +
landmark-EKF + weighting (the reference's ``__update_particle``,
``fast_slam_2.py:89-159`` — its hot inner kernel, SURVEY.md §3.6).  The
benchmark times the full jitted filter step (propagate + M measurement
updates + normalize + Neff + conditional resample + pose estimate) at
P=100,000 particles, L=64 landmark slots, M=16 measurements per tick.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the throughput of the NumPy oracle that transcribes the
reference's exact equations (tests/oracle/numpy_oracle.py) — i.e. "how many
times faster than the reference algorithm on CPU".  The baseline is PINNED
to a recorded least-contended measurement of that oracle on this host class
(it is a property of the reference algorithm, not of the day's co-tenant
load: live same-host measurements swung 4098-6685 updates/s across rounds
for identical code, making the ratio +-60% noise).  The live measurement is
still taken and reported as ``baseline_updates_per_s_measured``.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# best (least-contended) recorded oracle throughput on this host class —
# rounds 1-3 measured 6258 / 4098 / 6685 updates/s for the same oracle code
ORACLE_BASELINE_UPDATES_PER_S = 6685


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the headline config compiles in
    ~40 s - 15 min on this remote-TPU tunnel (variance is the tunnel's, not
    the program's); caching makes repeat bench runs start instantly and
    makes deeper-unroll configs affordable."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_fastslam"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def _timed_best(fn, sync, *, reps: int, budget_s: float) -> float:
    """Best-of-N wall time of ``fn`` (sync'd via ``sync``), stopping early
    only when the time budget runs out.  The chip is SHARED: co-tenant
    contention windows were observed inflating runs ~6x for minutes at a
    time, and round-2's official headline lagged the same config's measured
    best by 37% because best-of-3 landed inside one.  Many repetitions
    spread over a longer window make one burst unable to define the number;
    the BEST is the engine's throughput (the rest is the neighbor's)."""
    best = float("inf")
    t_start = time.perf_counter()
    for rep in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
        if rep >= 2 and time.perf_counter() - t_start > budget_s:
            break
    return best


def bench_tpu(num_steps: int = 768, chunk: int = 16, proposal: str = "motion",
              reps: int = 24, budget_s: float = 150.0):
    """Time ``num_steps`` data-dependent filter ticks inside ONE jit via
    ``lax.scan`` — one dispatch, one block.  This is immune to async-dispatch
    accounting artifacts (this container's remote-TPU runtime can report
    chained out-of-jit dispatches complete early, inflating naive loop
    timings by >100x).  ``num_steps`` must be large: each dispatch through
    the remote tunnel carries ~50-80 ms of constant overhead (measured by a
    K-sweep: K=5 -> 21.1 ms/step, K=20 -> 8.5, K=100 -> 6.4), so small K
    inflates the per-step figure.

    On TPU this measures the production batch-replay engine
    (``fastslam_steps_planes_chunked``, ``chunk`` ticks per fused kernel
    invocation with the landmark planes VMEM-resident; normalization/Neff/
    resampling at chunk boundaries).  Chunk=16 is the round-4 headline
    config — its accuracy is pinned in the EVAL scale table
    ("production chunked C=16 (N=100k, TPU)") alongside C=8; both sit at
    the same ~0.013-0.014 m ATE as the per-tick path on the 3-seed set.
    Measured figures on the same chip (2026-08-21, vpu_roofline.json +
    this sweep): per-tick 4.648 ms/tick; chunked C=8 unroll 4 = 2.418;
    C=8 unroll 8 = 2.329; C=16 unroll 4 = 2.242 ms/tick (714 M updates/s)
    — past the 2.23 ms C=8 plane-stream ceiling by halving the number of
    chunk-boundary plane streams.

    ``num_steps=768`` (round 5): at 96 steps the ~50-80 ms per-dispatch
    tunnel overhead adds ~0.7 ms/tick — the entire rounds-3/4 gap between
    the official capture (~2.95) and the same engine's measured best
    (2.242, longer scans).  768 ticks cuts the inflation to ~0.08 ms/tick;
    the three spread windows in main() still diagnose real contention."""
    import jax
    import jax.numpy as jnp

    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core.kernels import (
        fastslam_step, fastslam_steps_planes_chunked,
    )
    from fastslam_tpu.core.state import (
        Measurements, init_planes_state, init_state, pad_measurements,
    )

    # fused Pallas kernel on TPU; XLA scan path elsewhere
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    config = FastSLAMConfig(
        num_particles=100_000, max_landmarks=64, max_measurements=16,
        use_pallas=on_tpu, parity_mode=not on_tpu,
        proposal_mode=("fastslam2" if proposal == "fastslam2" and on_tpu
                       else "motion"),
    )
    ms_list = [(2.0 + 0.3 * i, -2.5 + 0.35 * i) for i in range(16)]
    ms = pad_measurements(config, ms_list)

    if on_tpu:
        # planes-native state in the kernel's [L, P] layout, chunked ticks
        state = init_planes_state(config, rng=0)
        n_chunks = num_steps // chunk
        num_steps = n_chunks * chunk
        rots = jnp.zeros(chunk, jnp.float32)
        trans = jnp.full(chunk, 0.4, jnp.float32)
        ms_c = Measurements(
            jnp.tile(ms.range_bearing[None], (chunk, 1, 1)),
            jnp.tile(ms.valid[None], (chunk, 1)),
        )

        def body(s, _):
            # unroll=4: best measured chunked config (bit-exact scheduling
            # change; eval_results/lever_bench.json — 2.61 vs 3.17 ms/tick)
            s, est = fastslam_steps_planes_chunked(
                s, rots, trans, ms_c, config, unroll=4
            )
            return s, est[-1]

        multi = jax.jit(
            lambda s: jax.lax.scan(body, s, None, length=n_chunks),
            donate_argnums=0,
        )
    else:
        state = init_state(config, rng=0)

        def body(s, _):
            s, pose = fastslam_step(
                s, jnp.float32(0.0), jnp.float32(0.4), ms, config
            )
            return s, pose

        multi = jax.jit(
            lambda s: jax.lax.scan(body, s, None, length=num_steps),
            donate_argnums=0,
        )

    state2, est = multi(state)  # compile + warm (donates `state`)
    jax.block_until_ready(state2)
    _ = np.asarray(est[-1])  # full sync before the timed region

    # Timed region, repeated: each repetition syncs via BOTH
    # block_until_ready AND a small host readback (on this remote-TPU runtime
    # block_until_ready can return early even for a single scan dispatch —
    # CLAUDE.md — while a readback of the final estimate row cannot, since it
    # depends on every step of the scan).
    holder = {"s": state2}

    def run():
        s, est = multi(holder["s"])
        holder["s"] = s  # donated input — rebind for the next repetition
        return s, est

    def sync(out):
        s, est = out
        jax.block_until_ready(s)
        _ = np.asarray(est[-1])

    best = _timed_best(run, sync, reps=reps, budget_s=budget_s)

    # conservative: the planes engine actually runs ceil-to-tile particles
    updates = config.num_particles * config.max_measurements * num_steps
    return updates / best, best / num_steps


def bench_e2e(num_steps: int = 192):
    """End-to-end ONLINE frames/s including the perception frontend: the
    fused production tick (scan -> line filter -> Hough -> clustering ->
    measurements -> filter step) scanned over ``num_steps`` REAL recorded
    simulator scans inside one jit.  Constant inputs would let XLA hoist the
    loop-invariant frontend out of the scan, so the xs are distinct scans.

    This is the number an online robot loop sees per tick on-device (the
    per-dispatch tunnel overhead of ~50-80 ms amortizes over K here exactly
    as the runner's fused one-dispatch tick amortizes it over a run).
    """
    import jax
    import jax.numpy as jnp

    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core import kernels
    from fastslam_tpu.core.state import init_planes_state, init_state
    from fastslam_tpu.drivers.replay import record_log
    from fastslam_tpu.drivers.sim_world import SimWorld
    from fastslam_tpu.frontend.pipeline import scan_to_measurements

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    config = FastSLAMConfig(
        num_particles=100_000, max_landmarks=64, max_measurements=16,
        use_pallas=on_tpu, parity_mode=False,
        pallas_interpret=False,
    )

    log = record_log(SimWorld(seed=2), num_ticks=num_steps)
    values = np.asarray(log.scans, np.float32)
    nb = values.shape[1]
    angles = np.radians(np.arange(nb) - nb // 2).astype(np.float32)
    valid = (values >= log.min_range) & (values <= log.max_range)
    pts = np.stack([values * np.cos(angles), values * np.sin(angles)],
                   axis=-1)
    pts[~valid] = 0.0
    rots = np.where(np.asarray(log.cmd_v) != 0, 0.0,
                    np.asarray(log.cmd_w) * 0.05).astype(np.float32)
    trs = np.where(np.asarray(log.cmd_v) != 0,
                   np.asarray(log.cmd_v) * 0.05 * config.velocity_fudge,
                   0.0).astype(np.float32)
    xs = (jnp.asarray(pts), jnp.asarray(valid),
          jnp.asarray(rots), jnp.asarray(trs))

    if config.use_planes_engine():
        state = init_planes_state(config, rng=0)
        step_fn = kernels.fastslam_step_planes
    else:
        state = init_state(config, rng=0)
        step_fn = kernels.fastslam_step

    def body(s, inp):
        p, v, rot, tr = inp
        ms = scan_to_measurements(p, v, config)
        s, est = step_fn(s, rot, tr, ms, config)
        return s, est

    multi = jax.jit(lambda s, x: jax.lax.scan(body, s, x), donate_argnums=0)

    state2, est = multi(state, xs)
    jax.block_until_ready(state2)
    _ = np.asarray(est[-1])

    holder = {"s": state2}

    def run():
        s, est = multi(holder["s"], xs)
        holder["s"] = s
        return s, est

    def sync(out):
        s, est = out
        jax.block_until_ready(s)
        _ = np.asarray(est[-1])

    best = _timed_best(run, sync, reps=8, budget_s=45.0)
    return num_steps / best


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
    _enable_compilation_cache()
    # THREE independent timing windows for the headline (the chip is
    # shared; a single window can land entirely inside a multi-minute
    # co-tenant contention burst — round 3's official number lagged the
    # same program's recorded best by 29% this way, and rounds 3-4 both
    # missed because the back-to-back windows fit inside ONE burst).  The
    # third window runs at the END of main(), after the ~4 minutes of fs2
    # + e2e + oracle benching, so a burst covering minute 0 rarely also
    # covers minute 6.  Every window's best lands in the JSON so a slow
    # official capture is diagnosable as contention (spread windows all
    # slow) vs regression (uniformly slow across rounds).
    windows = []
    ups, step_s = bench_tpu()
    windows.append(round(step_s, 6))
    ups2, step_s2 = bench_tpu(reps=12, budget_s=75.0)
    windows.append(round(step_s2, 6))
    if ups2 > ups:
        ups, step_s = ups2, step_s2
    # throughput of the accuracy-flagship FastSLAM 2.0 mode, tracked
    # round-over-round alongside the motion-proposal headline.  Same
    # num_steps as the headline: the ~50-80 ms dispatch overhead amortizes
    # over the scan length, so a shorter scan inflates ms/tick (round 4
    # measured the 48-step fs2 row ~0.8 ms/tick worse than the same
    # program at 96 steps).  Two windows, spread: the second runs after
    # the e2e bench below.
    # chunk=16 for fs2 too (round-5 sweep, same-window: C16u4 3.872 ms vs
    # C8u4 3.966-4.008 — the gain is smaller than the motion kernel's
    # +7.3% because the fs2 tick runs two measurement loops and the
    # halved chunk-boundary plane streams are a smaller fraction)
    fs2_windows = []
    fs2_ups, fs2_step_s = bench_tpu(num_steps=768, chunk=16,
                                    proposal="fastslam2",
                                    reps=12, budget_s=90.0)
    fs2_windows.append(round(fs2_step_s, 6))
    e2e_fps = bench_e2e()
    base_meas = bench_oracle_baseline()
    base_ups = ORACLE_BASELINE_UPDATES_PER_S
    # the pin is a property of the reference algorithm on THIS host class;
    # a live measurement far outside the documented contention band
    # (4098-6685 across rounds, i.e. down to ~0.6x the best) means the
    # host changed and the pin is stale — flag it loudly (stderr + JSON)
    # rather than silently reporting a ratio against the wrong machine
    baseline_pin_stale = not (base_ups / 2 <= base_meas <= base_ups * 2)
    if baseline_pin_stale:
        print(
            f"WARNING: measured oracle baseline {base_meas:.0f} updates/s "
            f"deviates >2x from the pinned {base_ups} — host class may "
            "have changed; re-record ORACLE_BASELINE_UPDATES_PER_S",
            file=sys.stderr,
        )
    fs2b_ups, fs2b_step_s = bench_tpu(num_steps=768, chunk=16,
                                      proposal="fastslam2",
                                      reps=10, budget_s=60.0)
    fs2_windows.append(round(fs2b_step_s, 6))
    if fs2b_ups > fs2_ups:
        fs2_ups, fs2_step_s = fs2b_ups, fs2b_step_s
    ups3, step_s3 = bench_tpu(reps=12, budget_s=75.0)
    windows.append(round(step_s3, 6))
    if ups3 > ups:
        ups, step_s = ups3, step_s3
    print(
        json.dumps(
            {
                "metric": "particle updates/s/chip at 100k particles",
                "value": round(ups),
                "unit": "updates/s",
                "vs_baseline": round(ups / base_ups, 1),
                "step_seconds": round(step_s, 6),
                # per-window bests (windows 1-2 back-to-back at start,
                # window 3 after ~6 min of other benching)
                "windows": windows,
                # FastSLAM 2.0 proposal mode, same geometry
                "fs2_step_seconds": round(fs2_step_s, 6),
                "fs2_updates_per_s": round(fs2_ups),
                "fs2_windows": fs2_windows,
                # online loop including the perception frontend, P=100k
                "e2e_frames_per_s": round(e2e_fps, 1),
                # pinned reference-algorithm baseline + today's live check
                "baseline_updates_per_s": base_ups,
                "baseline_updates_per_s_measured": round(base_meas),
                "baseline_pin_stale": baseline_pin_stale,
            }
        )
    )


if __name__ == "__main__":
    main()
