"""Pallas kernels vs the XLA reference paths (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core import kernels
from fastslam_tpu.core.pallas_kernels import fused_update, icp_correspondences
from fastslam_tpu.core.state import init_state, pad_measurements
from fastslam_tpu.proposal.icp import nearest_neighbors


def build_state(cfg, seed=0, fill=3):
    """A state with partially filled landmark maps and non-uniform weights."""
    rng = np.random.default_rng(seed)
    st = init_state(cfg, rng=seed)
    p, l = cfg.num_particles, cfg.max_landmarks
    poses = rng.normal(0, 1, (p, 3)).astype(np.float32)
    mean = rng.normal(0, 4, (p, l, 2)).astype(np.float32)
    cov = np.zeros((p, l, 4), np.float32)
    cov[..., 0] = rng.uniform(0.05, 0.2, (p, l))
    cov[..., 3] = rng.uniform(0.05, 0.2, (p, l))
    count = rng.integers(0, fill + 1, p).astype(np.int32)
    logw = rng.normal(-3, 0.5, p).astype(np.float32)
    return st._replace(
        poses=jnp.asarray(poses), log_weights=jnp.asarray(logw),
        lm_mean=jnp.asarray(mean), lm_cov=jnp.asarray(cov),
        lm_count=jnp.asarray(count),
    )


@pytest.mark.parametrize("parity", [True, False])
def test_fused_update_matches_scan_path(parity):
    cfg = FastSLAMConfig(
        num_particles=32, max_landmarks=8, max_measurements=4, parity_mode=parity
    )
    st = build_state(cfg, seed=1)
    ms = pad_measurements(cfg, [(2.0, 0.3), (3.5, -0.7), (1.0, 2.5)])

    want = kernels.update_particles(st, ms, cfg)
    logw, mean, cov, cnt = fused_update(
        st.poses, st.log_weights, st.lm_mean, st.lm_cov, st.lm_count,
        ms.range_bearing, ms.valid, cfg, interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(want.lm_count))
    np.testing.assert_allclose(np.asarray(logw), np.asarray(want.log_weights),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want.lm_mean),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(want.lm_cov),
                               rtol=1e-5, atol=1e-5)


def test_fused_update_appends_and_capacity():
    cfg = FastSLAMConfig(num_particles=8, max_landmarks=2, max_measurements=4)
    st = init_state(cfg, rng=0)  # empty maps
    # far-apart measurements -> two appends, then capacity drop
    ms = pad_measurements(cfg, [(2.0, 0.0), (8.0, 2.8), (5.0, -2.0)])
    logw, mean, cov, cnt = fused_update(
        st.poses, st.log_weights, st.lm_mean, st.lm_cov, st.lm_count,
        ms.range_bearing, ms.valid, cfg, interpret=True,
    )
    want = kernels.update_particles(st, ms, cfg)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(want.lm_count))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want.lm_mean),
                               rtol=1e-5, atol=1e-5)


def test_fused_update_via_config_flag():
    cfg_scan = FastSLAMConfig(num_particles=16, max_landmarks=8, max_measurements=4)
    cfg_pl = cfg_scan.replace(use_pallas=True, pallas_interpret=True)
    st = build_state(cfg_scan, seed=2)
    ms = pad_measurements(cfg_scan, [(2.5, 0.1), (4.0, -1.2)])
    out_scan = kernels.update_particles(st, ms, cfg_scan)
    out_pl = kernels.update_particles(st, ms, cfg_pl)
    np.testing.assert_allclose(
        np.asarray(out_pl.lm_mean), np.asarray(out_scan.lm_mean), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_pl.lm_count), np.asarray(out_scan.lm_count)
    )


@pytest.mark.parametrize("parity", [True, False])
def test_planes_step_matches_block_step(parity):
    """fastslam_step_planes == fastslam_step(use_pallas) — same RNG stream,
    same kernel arithmetic, only the carried layout differs."""
    from fastslam_tpu.core.state import from_planes, to_planes

    cfg = FastSLAMConfig(
        num_particles=128, max_landmarks=8, max_measurements=4,
        parity_mode=parity, use_pallas=True, pallas_interpret=True,
    )
    st = build_state(cfg, seed=4)
    ms = pad_measurements(cfg, [(2.0, 0.3), (3.5, -0.7), (1.0, 2.5)])

    want_st, want_pose = kernels.fastslam_step(
        st, jnp.float32(0.0), jnp.float32(0.4), ms, cfg
    )
    got_ps, got_pose = kernels.fastslam_step_planes(
        to_planes(st), jnp.float32(0.0), jnp.float32(0.4), ms, cfg
    )
    got_st = from_planes(got_ps)

    np.testing.assert_allclose(np.asarray(got_pose), np.asarray(want_pose),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_st.lm_count),
                                  np.asarray(want_st.lm_count))
    np.testing.assert_allclose(np.asarray(got_st.lm_mean),
                               np.asarray(want_st.lm_mean), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_st.log_weights),
                               np.asarray(want_st.log_weights),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_st.poses),
                               np.asarray(want_st.poses), rtol=1e-6, atol=1e-6)


def test_planes_round_trip_pads_to_lane_tile():
    from fastslam_tpu.core.state import from_planes, to_planes

    cfg = FastSLAMConfig(num_particles=100, max_landmarks=8, max_measurements=4)
    st = build_state(cfg, seed=5)
    ps = to_planes(st)
    assert ps.num_particles == 128  # rounded up to the lane tile
    # padded particles carry ~zero weight
    assert float(np.exp(np.asarray(ps.log_weights[100:])).sum()) < 1e-20
    back = from_planes(ps, num_particles=100)
    np.testing.assert_array_equal(np.asarray(back.poses), np.asarray(st.poses))
    np.testing.assert_array_equal(np.asarray(back.lm_mean), np.asarray(st.lm_mean))
    np.testing.assert_array_equal(np.asarray(back.lm_cov), np.asarray(st.lm_cov))
    np.testing.assert_array_equal(np.asarray(back.lm_count), np.asarray(st.lm_count))


def test_icp_correspondences_match_dense_nn():
    rng = np.random.default_rng(3)
    src = rng.normal(0, 2, (64, 2)).astype(np.float32)
    tgt = rng.normal(0, 2, (96, 2)).astype(np.float32)
    tvalid = rng.random(96) > 0.2

    d_want, i_want = nearest_neighbors(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(tvalid)
    )
    d_got, i_got = icp_correspondences(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(tvalid), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_want))
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want), rtol=1e-6)


# ---------------------------------------------------------------------------
# multi-tick (chunked) kernel
# ---------------------------------------------------------------------------

def _planes_from_state(st):
    from fastslam_tpu.core.state import to_planes

    return to_planes(st)


def _sequential_reference(ps, noisy_rot, noisy_trans, z, z_valid, cfg):
    """Per-tick composition the chunked kernel must match: explicit
    propagation (reference rotation-XOR-translation order) followed by the
    single-tick fused planes update, landmark planes streamed every tick."""
    from fastslam_tpu.core.pallas_kernels import fused_update_planes

    poses, logw = ps.poses, ps.log_weights
    mx, my, ca, cb, cc, cd, cnt = (ps.lm_mx, ps.lm_my, ps.lm_ca, ps.lm_cb,
                                   ps.lm_cc, ps.lm_cd, ps.lm_count)
    est = []
    for k in range(z.shape[0]):
        yaw = kernels.wrap_angle(poses[:, 2] + noisy_rot[k])
        x = poses[:, 0] + noisy_trans[k] * jnp.cos(yaw)
        y = poses[:, 1] + noisy_trans[k] * jnp.sin(yaw)
        poses = jnp.stack([x, y, yaw], axis=-1)
        logw, mx, my, ca, cb, cc, cd, cnt = fused_update_planes(
            poses, logw, mx, my, ca, cb, cc, cd, cnt,
            z[k], z_valid[k], cfg, interpret=True,
        )
        est.append((x, y, yaw, logw))
    return est, (mx, my, ca, cb, cc, cd, cnt)


@pytest.mark.parametrize("c", [1, 4])
def test_chunked_kernel_matches_sequential(c):
    """C ticks inside one kernel == C single-tick kernel invocations with the
    same noise draws (production mode; appends, EKF updates, and invalid
    measurements all crossing tick boundaries)."""
    from fastslam_tpu.core.pallas_kernels import fused_update_planes_multi

    cfg = FastSLAMConfig(
        num_particles=128, max_landmarks=8, max_measurements=4,
        parity_mode=False, use_pallas=True, pallas_interpret=True,
    )
    st = build_state(cfg, seed=11, fill=2)
    ps = _planes_from_state(st)
    rng = np.random.default_rng(12)

    # per-tick measurements: mix of updates, appends, and padded slots
    z = rng.uniform(0.5, 6.0, (c, 4, 2)).astype(np.float32)
    z[..., 1] = rng.uniform(-3.0, 3.0, (c, 4))
    z_valid = np.zeros((c, 4), bool)
    for k in range(c):
        z_valid[k, : rng.integers(0, 5)] = True  # packed-first masks
    # rotation-XOR-translation ticks
    rotating = rng.random(c) < 0.5
    noisy_rot = np.where(
        rotating[:, None], rng.normal(0.3, 0.01, (c, ps.num_particles)), 0.0
    ).astype(np.float32)
    noisy_trans = np.where(
        rotating[:, None], 0.0, rng.normal(0.4, 0.01, (c, ps.num_particles))
    ).astype(np.float32)

    tx, ty, tyaw, tlogw, mx, my, ca, cb, cc, cd, cnt = fused_update_planes_multi(
        ps.poses, ps.log_weights,
        ps.lm_mx, ps.lm_my, ps.lm_ca, ps.lm_cb, ps.lm_cc, ps.lm_cd,
        ps.lm_count,
        jnp.asarray(z), jnp.asarray(z_valid),
        jnp.asarray(noisy_rot), jnp.asarray(noisy_trans), cfg,
        interpret=True,
    )

    est, final = _sequential_reference(
        ps, jnp.asarray(noisy_rot), jnp.asarray(noisy_trans),
        jnp.asarray(z), jnp.asarray(z_valid), cfg,
    )

    for k, (x, y, yaw, logw) in enumerate(est):
        np.testing.assert_allclose(np.asarray(tx[k]), np.asarray(x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ty[k]), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tyaw[k]), np.asarray(yaw),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tlogw[k]), np.asarray(logw),
                                   rtol=1e-4, atol=1e-4)
    w_mx, w_my, w_ca, w_cb, w_cc, w_cd, w_cnt = final
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(w_cnt))
    np.testing.assert_allclose(np.asarray(mx), np.asarray(w_mx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(my), np.asarray(w_my),
                               rtol=1e-4, atol=1e-4)
    # production streams no cc plane (cc == cb invariant)
    assert cc is None and w_cc is None
    for got, want in ((ca, w_ca), (cb, w_cb), (cd, w_cd)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_chunked_step_runs_and_estimates():
    """fastslam_steps_planes_chunked: full chunked step (propagate noise,
    kernel, chunk-boundary normalize/Neff/resample, per-tick estimates)."""
    from fastslam_tpu.core.state import init_planes_state

    cfg = FastSLAMConfig(
        num_particles=128, max_landmarks=8, max_measurements=4,
        parity_mode=False, use_pallas=True, pallas_interpret=True,
    )
    state = init_planes_state(cfg, rng=0)
    c = 6
    rots = jnp.zeros(c, jnp.float32)
    trans = jnp.full(c, 0.4, jnp.float32)
    # geometrically consistent observations of two FIXED world landmarks
    # from the commanded path (x = 0.4 * tick), so ticks 2.. re-associate
    lms = np.asarray([[3.0, 1.0], [1.5, -2.0]])
    rb = np.zeros((c, 4, 2), np.float32)
    for k in range(c):
        rx = 0.4 * (k + 1)
        d = lms - np.asarray([rx, 0.0])
        rb[k, :2, 0] = np.hypot(d[:, 0], d[:, 1])
        rb[k, :2, 1] = np.arctan2(d[:, 1], d[:, 0])
    rb = jnp.asarray(rb)
    valid = jnp.tile(jnp.asarray([True, True, False, False]), (c, 1))
    from fastslam_tpu.core.state import Measurements

    state2, est = kernels.fastslam_steps_planes_chunked(
        state, rots, trans, Measurements(rb, valid), cfg
    )
    assert est.shape == (c, 3)
    assert np.isfinite(np.asarray(est)).all()
    assert np.isfinite(np.asarray(state2.log_weights)).all()
    # weights normalized at the chunk boundary
    np.testing.assert_allclose(
        np.exp(np.asarray(state2.log_weights)).sum(), 1.0, rtol=1e-4
    )
    # two static landmarks observed every tick -> two slots per particle
    np.testing.assert_array_equal(np.asarray(state2.lm_count),
                                  np.full(128, 2, np.int32))
    # parity mode must refuse chunked execution
    with pytest.raises(NotImplementedError):
        kernels.fastslam_steps_planes_chunked(
            state, rots, trans, Measurements(rb, valid),
            cfg.replace(parity_mode=True),
        )


@pytest.mark.slow
def test_unroll_is_bit_exact_and_shadow_tracks_f32():
    """The manual measurement-loop unroll must be a pure scheduling change
    (bit-exact), and bf16 shadow association must track the f32 path (same
    decisions away from gate boundaries => same EKF arithmetic)."""
    from fastslam_tpu.core.state import init_planes_state

    cfg = FastSLAMConfig(
        num_particles=256, max_landmarks=16, max_measurements=8,
        parity_mode=False, use_pallas=True, pallas_interpret=True,
    )
    ms = pad_measurements(
        cfg, [(2.0 + 0.3 * i, -2.0 + 0.4 * i) for i in range(5)]
    )

    def run(**kw):
        st = init_planes_state(cfg, rng=0)
        for _ in range(4):
            st, est = kernels.fastslam_step_planes(
                st, jnp.float32(0.0), jnp.float32(0.4), ms, cfg, **kw
            )
        return st, est

    # explicit unroll=1 baseline: the kernels default to unroll=2, so a
    # bare run() would compare unrolled against unrolled (vacuous)
    base_st, base_est = run(unroll=1)
    for unroll in (2, 4):
        u_st, u_est = run(unroll=unroll)
        np.testing.assert_array_equal(np.asarray(u_st.lm_mx),
                                      np.asarray(base_st.lm_mx))
        np.testing.assert_array_equal(np.asarray(u_st.log_weights),
                                      np.asarray(base_st.log_weights))
        np.testing.assert_array_equal(np.asarray(u_est),
                                      np.asarray(base_est))

    s_st, s_est = run(assoc_shadow=True)
    # this synthetic case sits far from every gate boundary, so the bf16
    # association makes identical decisions and the (f32) EKF matches
    np.testing.assert_allclose(np.asarray(s_st.lm_mx),
                               np.asarray(base_st.lm_mx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_est), np.asarray(base_est),
                               atol=1e-6)


def test_chunked_unroll_and_shadow_flags():
    from fastslam_tpu.core.state import Measurements, init_planes_state

    cfg = FastSLAMConfig(
        num_particles=256, max_landmarks=16, max_measurements=8,
        parity_mode=False, use_pallas=True, pallas_interpret=True,
    )
    ms = pad_measurements(
        cfg, [(2.0 + 0.3 * i, -2.0 + 0.4 * i) for i in range(5)]
    )
    c = 4
    msc = Measurements(jnp.tile(ms.range_bearing[None], (c, 1, 1)),
                       jnp.tile(ms.valid[None], (c, 1)))

    def run(**kw):
        st = init_planes_state(cfg, rng=0)
        return kernels.fastslam_steps_planes_chunked(
            st, jnp.zeros(c), jnp.full(c, 0.4), msc, cfg, **kw
        )

    # explicit unroll=1 baseline (default is unroll=2 — see above)
    base_st, base_est = run(unroll=1)
    for unroll in (2, 4):
        u_st, u_est = run(unroll=unroll)
        np.testing.assert_array_equal(np.asarray(u_est),
                                      np.asarray(base_est))
        np.testing.assert_array_equal(np.asarray(u_st.lm_mx),
                                      np.asarray(base_st.lm_mx))
    s_st, s_est = run(assoc_shadow=True)
    np.testing.assert_allclose(np.asarray(s_est), np.asarray(base_est),
                               atol=1e-6)

@pytest.mark.slow
def test_fs2_reuse_association_matches_full_path():
    """config.fs2_reuse_association (RETIRED lever — see the config
    rationale) stores the proposal pass's packed argmin keys, rebuilds
    the EKF pass's one-hot from them, and guards appends against
    same-tick duplicates.  This pins that the flag still executes on
    both fused fs2 kernels and that its acquisition-phase divergence
    from the full path stays bounded."""
    from fastslam_tpu.core.state import Measurements, init_planes_state

    base_kw = dict(
        num_particles=256, max_landmarks=16, max_measurements=8,
        parity_mode=False, use_pallas=True, pallas_interpret=True,
        proposal_mode="fastslam2",
    )
    ms = pad_measurements(
        FastSLAMConfig(**base_kw),
        [(2.0 + 0.3 * i, -2.0 + 0.4 * i) for i in range(5)],
    )

    def run_per_tick(reuse, ticks=4):
        cfg = FastSLAMConfig(**base_kw, fs2_reuse_association=reuse)
        st = init_planes_state(cfg, rng=0)
        ests = []
        for _ in range(ticks):
            st, est = kernels.fastslam_step_planes(
                st, jnp.float32(0.0), jnp.float32(0.4), ms, cfg
            )
            ests.append(np.asarray(est))
        return st, ests

    b_st, b_ests = run_per_tick(False)
    r_st, r_ests = run_per_tick(True)
    # the duplicate guard must bound acquisition-phase divergence: the
    # full path merges same-tick measurements into each other's fresh
    # (default-cov, ~2.5 m gate) appends immediately, the reuse path
    # defers/re-times those merges — counts stay within the per-tick
    # measurement budget and nothing double-appends (the naive reuse
    # without the guard appended duplicates for every same-tick
    # neighbor).  The lever is RETIRED for accuracy (config rationale);
    # this test pins that the flag still runs and stays bounded.
    cnt_diff = np.abs(np.asarray(r_st.lm_count, np.int64)
                      - np.asarray(b_st.lm_count, np.int64))
    assert cnt_diff.max() <= 5, cnt_diff.max()
    est_diff = np.abs(np.asarray(r_ests[-1]) - np.asarray(b_ests[-1]))
    assert est_diff.max() < 0.2, est_diff.max()

    c = 4
    msc = Measurements(jnp.tile(ms.range_bearing[None], (c, 1, 1)),
                       jnp.tile(ms.valid[None], (c, 1)))

    def run_chunked(reuse):
        cfg = FastSLAMConfig(**base_kw, fs2_reuse_association=reuse)
        st = init_planes_state(cfg, rng=0)
        return kernels.fastslam_steps_planes_chunked(
            st, jnp.zeros(c), jnp.full(c, 0.4), msc, cfg
        )

    b_st, b_est = run_chunked(False)
    r_st, r_est = run_chunked(True)
    cnt_diff = np.abs(np.asarray(r_st.lm_count, np.int64)
                      - np.asarray(b_st.lm_count, np.int64))
    assert cnt_diff.max() <= 5, cnt_diff.max()
    est_diff = np.abs(np.asarray(r_est) - np.asarray(b_est))
    assert est_diff.max() < 0.2, est_diff.max()
