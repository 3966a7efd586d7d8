"""2-D point-to-point ICP, jittable, with masked fixed-size clouds.

The reference ICP (``fast_slam_2/algorithms/icp.py:13-89``) loops up to 100
iterations of scipy-KDTree nearest neighbours + SVD best-fit, converging when
the mean NN distance stops changing by more than 1e-5.  The README notes it is
disabled in the reference's main loop; the north star promotes it to the
FastSLAM 2.0 motion proposal, so it is first-class here.

TPU-native reformulation:

* KDTree NN -> dense all-pairs distance matrix + argmin.  Laser scans are
  tiny (<= 180 points) so the [N, M] matrix is trivially VPU-friendly; a
  Pallas-tiled variant for large clouds lives in ``core.pallas_kernels``.
* SVD best-fit -> the closed-form 2-D solution: after centering, the optimal
  proper rotation angle is ``atan2(sum(cross), sum(dot))`` over corresponding
  point pairs.  This is mathematically identical to the reference's
  SVD-with-reflection-fix (``icp.py:74-88``): both produce the closest
  det=+1 rotation in the Frobenius sense.
* the data-dependent convergence break (``icp.py:50-55``) -> a
  ``lax.while_loop`` whose predicate combines iteration count and error delta.

Padding: invalid source points are masked out of the error/centroid sums;
invalid target points are excluded from the NN search by an additive mask.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fastslam_tpu.config import FastSLAMConfig


class ICPResult(NamedTuple):
    rotation: jax.Array      # [2, 2] accumulated rotation matrix
    translation: jax.Array   # [2] accumulated translation
    mean_error: jax.Array    # scalar final mean NN distance
    num_iters: jax.Array     # scalar iterations executed


def nearest_neighbors(source: jax.Array, target: jax.Array,
                      target_valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """All-pairs NN: for each source point the closest valid target point.

    Returns (distances [N], indices [N])."""
    diff = source[:, None, :] - target[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(target_valid[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0])
    return dist, idx


def best_fit_transform(source: jax.Array, target: jax.Array,
                       weight: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Weighted closed-form 2-D rigid alignment source -> target.

    Equivalent to the reference's SVD route (``icp.py:59-89``) restricted to
    proper rotations: theta* = atan2(sum w (s x t), sum w (s . t)) over
    centered pairs; translation = t_centroid - R s_centroid.
    """
    wsum = jnp.maximum(jnp.sum(weight), 1e-12)
    cs = jnp.sum(source * weight[:, None], axis=0) / wsum
    ct = jnp.sum(target * weight[:, None], axis=0) / wsum
    s = source - cs
    t = target - ct
    dot = jnp.sum(weight * (s[:, 0] * t[:, 0] + s[:, 1] * t[:, 1]))
    cross = jnp.sum(weight * (s[:, 0] * t[:, 1] - s[:, 1] * t[:, 0]))
    theta = jnp.arctan2(cross, dot)
    c, sn = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[c, -sn], [sn, c]])
    trans = ct - rot @ cs
    return rot, trans


def icp(
    source: jax.Array,
    target: jax.Array,
    source_valid: jax.Array,
    target_valid: jax.Array,
    config: FastSLAMConfig,
) -> ICPResult:
    """Iterative closest point between two masked point clouds.

    Loop structure mirrors ``icp.py:34-57``: NN correspondence, best-fit
    transform, apply to the source, accumulate (R_total = R R_total,
    t_total = R t_total + t), converge on |prev_err - err| < tolerance.
    """
    sw = source_valid.astype(source.dtype)

    def cond(carry):
        it, _, _, _, prev_err, err, converged = carry
        return (it < config.icp_max_iterations) & (~converged)

    def body(carry):
        it, src, rot_total, trans_total, prev_err, _, _ = carry
        dist, idx = nearest_neighbors(src, target, target_valid)
        matched = target[idx]
        rot, trans = best_fit_transform(src, matched, sw)
        src = src @ rot.T + trans
        rot_total = rot @ rot_total
        trans_total = rot @ trans_total + trans
        err = jnp.sum(dist * sw) / jnp.maximum(jnp.sum(sw), 1e-12)
        converged = jnp.abs(prev_err - err) < config.icp_tolerance
        return it + 1, src, rot_total, trans_total, err, err, converged

    init = (
        jnp.int32(0),
        source,
        jnp.eye(2, dtype=source.dtype),
        jnp.zeros((2,), source.dtype),
        jnp.asarray(jnp.inf, source.dtype),
        jnp.asarray(jnp.inf, source.dtype),
        jnp.asarray(False),
    )
    it, _, rot_total, trans_total, _, err, _ = jax.lax.while_loop(cond, body, init)
    return ICPResult(rotation=rot_total, translation=trans_total,
                     mean_error=err, num_iters=it)


def icp_odometry(result: ICPResult, v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(rotation, translation) odometry from an ICP result.

    Mirrors ``robot.py:90-120``: while translating, use |t| and zero rotation;
    while rotating, use -atan2(R10, R00) and zero translation.
    """
    moving = v != 0
    translation = jnp.where(moving, jnp.linalg.norm(result.translation), 0.0)
    rotation = jnp.where(
        moving, 0.0, -jnp.arctan2(result.rotation[1, 0], result.rotation[0, 0])
    )
    return rotation, translation
