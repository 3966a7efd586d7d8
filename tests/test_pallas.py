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
