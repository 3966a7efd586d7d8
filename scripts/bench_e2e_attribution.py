"""Attribute the online end-to-end tick (bench.py bench_e2e ~13.8 ms at
P=100k => ~72 frames/s, flat for three rounds).

Decomposition (round-5 verdict item #7): is the e2e tick bound by
per-dispatch tunnel overhead, the perception frontend (line filter ->
Hough -> clustering -> measurements), or the filter kernel?

Method — all inside one jit via lax.scan over REAL recorded scans (the
same harness as bench.py's bench_e2e, so numbers are directly comparable):

  1. K-sweep of the full e2e scan (K in {16, 64, 192}): per-tick time vs K
     separates the constant per-dispatch overhead (~50-80 ms documented)
     from the true per-tick cost.
  2. frontend-only scan: scan_to_measurements alone, same scans — the
     perception cost.
  3. filter-only scan: the per-tick planes step with fixed measurements —
     the filter cost (cross-check vs scripts/bench_step.py --planes).

Writes ``eval_results/e2e_attribution.json`` and prints one JSON line.
Run on the TPU (serialize with other TPU work).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "..", "eval_results")


def _enable_compilation_cache():
    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_fastslam"))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def _sync_best(multi, state, xs, reps=6, budget_s=40.0):
    import jax

    if xs is None:
        run = lambda s: multi(s)
    else:
        run = lambda s: multi(s, xs)
    out = run(state)
    s2 = out[0]
    jax.block_until_ready(s2)
    _ = np.asarray(jax.tree_util.tree_leaves(out[1])[0])
    best = float("inf")
    t_start = time.perf_counter()
    holder = s2
    for rep in range(reps):
        t0 = time.perf_counter()
        out = run(holder)
        holder = out[0]
        jax.block_until_ready(holder)
        _ = np.asarray(jax.tree_util.tree_leaves(out[1])[0])
        best = min(best, time.perf_counter() - t0)
        if rep >= 2 and time.perf_counter() - t_start > budget_s:
            break
    return best


def make_scan_inputs(num_steps, config):
    import jax.numpy as jnp

    from fastslam_tpu.drivers.replay import record_log
    from fastslam_tpu.drivers.sim_world import SimWorld

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
    return (jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(rots), jnp.asarray(trs))


def main():
    import jax
    import jax.numpy as jnp

    _enable_compilation_cache()

    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core import kernels
    from fastslam_tpu.core.state import (
        init_planes_state, pad_measurements,
    )
    from fastslam_tpu.frontend.pipeline import scan_to_measurements

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    config = FastSLAMConfig(
        num_particles=100_000, max_landmarks=64, max_measurements=16,
        use_pallas=on_tpu, parity_mode=False, pallas_interpret=not on_tpu,
    )

    out = {"config": {"particles": 100_000, "P": "planes per-tick"}}

    # 1. K-sweep of the full e2e tick
    e2e = {}
    for k in (16, 64, 192):
        xs = make_scan_inputs(k, config)
        state = init_planes_state(config, rng=0)

        def body(s, inp):
            p, v, rot, tr = inp
            ms = scan_to_measurements(p, v, config)
            s, est = kernels.fastslam_step_planes(s, rot, tr, ms, config)
            return s, est

        multi = jax.jit(lambda s, x: jax.lax.scan(body, s, x),
                        donate_argnums=0)
        best = _sync_best(multi, state, xs)
        e2e[k] = best / k
        print(f"e2e K={k}: {best / k * 1e3:.3f} ms/tick", file=sys.stderr)
    out["e2e_ms_per_tick_by_k"] = {k: round(v * 1e3, 3)
                                   for k, v in e2e.items()}
    # linear fit total = a*K + b across the sweep: a = asymptotic per-tick,
    # b = per-dispatch constant
    ks = np.array(sorted(e2e))
    tot = np.array([e2e[k] * k for k in ks])
    a, b = np.polyfit(ks, tot, 1)
    out["per_tick_ms_asymptotic"] = round(a * 1e3, 3)
    out["per_dispatch_overhead_ms"] = round(b * 1e3, 1)

    # 2. frontend only (same scans, largest K)
    k = 192
    xs = make_scan_inputs(k, config)

    def body_fe(s, inp):
        p, v, _rot, _tr = inp
        ms = scan_to_measurements(p, v, config)
        # carry a scalar that depends on the measurements so nothing is
        # dead-code-eliminated
        return s + jnp.sum(ms.range_bearing) + jnp.sum(ms.valid), ms.valid[0]

    multi_fe = jax.jit(lambda s, x: jax.lax.scan(body_fe, s, x))
    best = _sync_best(multi_fe, jnp.float32(0.0), xs)
    out["frontend_ms_per_tick"] = round(best / k * 1e3, 3)
    print(f"frontend: {best / k * 1e3:.3f} ms/tick", file=sys.stderr)

    # 3. filter only (fixed measurements, K=192 per-tick planes)
    ms = pad_measurements(
        config, [(2.0 + 0.3 * i, -2.5 + 0.35 * i) for i in range(16)])
    state = init_planes_state(config, rng=0)

    def body_f(s, _):
        s, est = kernels.fastslam_step_planes(
            s, jnp.float32(0.0), jnp.float32(0.4), ms, config)
        return s, est

    multi_f = jax.jit(lambda s: jax.lax.scan(body_f, s, None, length=k),
                      donate_argnums=0)
    best = _sync_best(multi_f, state, None)
    out["filter_ms_per_tick"] = round(best / k * 1e3, 3)
    print(f"filter: {best / k * 1e3:.3f} ms/tick", file=sys.stderr)

    # NOTE: frontend + filter(16 meas) can exceed the e2e asymptote —
    # the e2e scan consumes the LOG's measurement stream (~2 valid
    # measurements/tick on average vs the filter-only probe's fixed 16;
    # the dynamic measurement skip is ~155 us per padded-out slot), and
    # resampling only fires on weight-degenerate ticks.  The K-sweep's
    # per-tick spread (early ticks resample nearly every tick) is the
    # resample-rate signal.
    out["note"] = ("filter_ms is at 16 fixed valid measurements; the "
                   "e2e log averages ~2, so components are not additive")

    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "e2e_attribution.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
