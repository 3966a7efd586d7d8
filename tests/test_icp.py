"""ICP tests: recover known rigid transforms; parity with a scipy/numpy
reference of the algorithm (icp.py math, SURVEY.md §3.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.proposal.icp import best_fit_transform, icp, icp_odometry, nearest_neighbors

CFG = FastSLAMConfig()


def rot2(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def make_cloud(n=120, seed=0):
    rng = np.random.default_rng(seed)
    # L-shaped wall plus a diagonal: three line directions, so pure
    # translations are fully constrained (no ICP aperture ambiguity)
    k = n // 3
    a = np.stack([np.linspace(0, 3, k), np.zeros(k)], -1)
    b = np.stack([np.zeros(k), np.linspace(0, 2, k)], -1)
    m = n - 2 * k
    c = np.stack([np.linspace(1, 2.5, m), np.linspace(2, 0.5, m)], -1)
    pts = np.concatenate([a, b, c]) + rng.normal(0, 0.003, (n, 2))
    return pts.astype(np.float32)


def test_best_fit_transform_exact():
    src = make_cloud()
    theta, t = 0.3, np.array([0.5, -0.2])
    dst = src @ rot2(theta).T + t
    w = np.ones(len(src), np.float32)
    r_got, t_got = best_fit_transform(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r_got), rot2(theta), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_got), t, atol=1e-5)


def test_best_fit_transform_always_proper_rotation():
    # degenerate collinear case where plain SVD can return a reflection
    src = np.stack([np.linspace(0, 1, 50), np.zeros(50)], -1).astype(np.float32)
    dst = src[::-1].copy()
    w = np.ones(50, np.float32)
    r_got, _ = best_fit_transform(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    assert np.linalg.det(np.asarray(r_got)) == pytest.approx(1.0, abs=1e-5)


def test_nearest_neighbors_respects_mask():
    src = np.zeros((3, 2), np.float32)
    tgt = np.array([[0.1, 0], [5, 5], [0.05, 0]], np.float32)
    tvalid = np.array([True, True, False])
    dist, idx = nearest_neighbors(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(tvalid))
    assert (np.asarray(idx) == 0).all()  # masked closer point ignored


@pytest.mark.parametrize("theta,t", [(0.1, (0.08, 0.04)), (-0.15, (0.0, 0.0)), (0.0, (0.02, -0.015))])
def test_icp_recovers_transform(theta, t):
    """ICP aligns source onto target: target = R_true source + t_true; the
    accumulated (R, t) must reproduce that map.  Transforms are scan-to-scan
    sized (one sim tick moves ~0.02-0.05 m); vanilla point-to-point ICP is
    only locally convergent, same as the reference (icp.py)."""
    src = make_cloud(seed=1)
    t = np.asarray(t)
    dst = src @ rot2(theta).T + t
    valid = np.ones(len(src), bool)
    res = icp(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), jnp.asarray(valid), CFG)
    moved = src @ np.asarray(res.rotation).T + np.asarray(res.translation)
    err = np.linalg.norm(moved - dst, axis=1).mean()
    assert err < 0.03, f"residual {err}"
    assert float(res.mean_error) < 0.03


def test_icp_matches_numpy_reference_loop():
    """Same algorithm written straight from the reference equations in numpy
    (KDTree NN + SVD best-fit, icp.py:34-57) — results must agree."""
    from scipy.spatial import KDTree

    def np_icp(source, target, max_iter=100, tol=1e-5):
        prev_err = np.inf
        r_tot, t_tot = np.eye(2), np.zeros(2)
        src = source.copy()
        for _ in range(max_iter):
            d, idx = KDTree(target).query(src)
            matched = target[idx]
            cs, ct = src.mean(0), matched.mean(0)
            a, b = src - cs, matched - ct
            cov = a.T @ b
            u, _, vt = np.linalg.svd(cov)
            r = vt.T @ u.T
            if np.linalg.det(r) < 0:
                vt[-1] *= -1
                r = vt.T @ u.T
            t = ct - r @ cs
            src = src @ r.T + t
            r_tot = r @ r_tot
            t_tot = r @ t_tot + t
            err = d.mean()
            if abs(prev_err - err) < tol:
                break
            prev_err = err
        return r_tot, t_tot

    src = make_cloud(seed=2)
    dst = src @ rot2(0.12).T + np.array([0.2, -0.1])
    r_np, t_np = np_icp(src.astype(np.float64), dst.astype(np.float64))

    valid = np.ones(len(src), bool)
    res = icp(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), jnp.asarray(valid), CFG)
    np.testing.assert_allclose(np.asarray(res.rotation), r_np, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.translation), t_np, atol=5e-3)


def test_icp_odometry_modes():
    res_t = icp(
        jnp.asarray(make_cloud()), jnp.asarray(make_cloud() + np.array([0.1, 0.0], np.float32)),
        jnp.ones(120, bool), jnp.ones(120, bool), CFG,
    )
    rot, trans = icp_odometry(res_t, jnp.float32(0.3))
    assert float(rot) == 0.0 and float(trans) == pytest.approx(0.1, abs=0.02)

    src = make_cloud()
    dst = src @ rot2(0.1).T
    res_r = icp(jnp.asarray(src), jnp.asarray(dst), jnp.ones(120, bool), jnp.ones(120, bool), CFG)
    rot, trans = icp_odometry(res_r, jnp.float32(0.0))
    assert float(trans) == 0.0
    assert abs(float(rot)) == pytest.approx(0.1, abs=0.02)


def test_point_to_line_beats_point_to_point_on_wall_slide():
    """Sliding along a long wall: p2p underestimates the shift (aperture),
    p2l recovers it."""
    from fastslam_tpu.proposal.icp import icp_point_to_line

    n = 120
    # mostly one long wall plus a short perpendicular stub
    a = np.stack([np.linspace(0, 6, 100), np.zeros(100)], -1)
    b = np.stack([np.zeros(20), np.linspace(0, 0.8, 20)], -1)
    src = np.concatenate([a, b]).astype(np.float32)
    shift = np.array([0.06, 0.0], np.float32)  # slide along the wall
    dst = src + shift
    valid = np.ones(n, bool)

    res_pp = icp(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid),
                 jnp.asarray(valid), CFG)
    res_pl = icp_point_to_line(jnp.asarray(src), jnp.asarray(dst),
                               jnp.asarray(valid), jnp.asarray(valid), CFG)
    err_pp = abs(float(jnp.linalg.norm(res_pp.translation)) - 0.06)
    err_pl = abs(float(jnp.linalg.norm(res_pl.translation)) - 0.06)
    assert err_pl < 0.01
    assert err_pl < err_pp  # strictly better on the aperture case
