"""Scan -> measurements: the full perception front-end, jittable end-to-end.

Reproduces ``LandmarkUtils.get_measurements_to_landmarks``
(``fast_slam_2/utils/landmark_utils.py:21-89``):

  scan points -> line filter -> Hough line intersections -> eps=0.5
  connected-component clustering -> corner gate (an intersection is a corner
  iff some scan point lies within 0.1 m, ``:77-87``) -> (range, bearing)
  measurements from the origin (``geometry_utils.py:65-74``).

The reference's ragged lists become masked fixed-capacity arrays; the final
compaction into ``[max_measurements]`` uses a stable argsort so measurement
order follows intersection enumeration order (which downstream first-match
association depends on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core.state import Measurements
from fastslam_tpu.frontend.clustering import connected_component_clusters
from fastslam_tpu.frontend.hough import hough_lines, line_intersections
from fastslam_tpu.frontend.line_filter import line_filter


def extract_corners(points: jax.Array, valid: jax.Array,
                    config: FastSLAMConfig):
    """Detect corner landmarks in a scan.

    Args:
      points: ``[N, 2]`` metric scan points (robot frame); valid ``[N]``.

    Returns ``(corners [C, 2], corner_valid [C])`` with ``C = max_hough_lines**2``.
    """
    filtered = line_filter(points, config)
    lines, off_x, off_y, width, height = hough_lines(filtered, valid, config)
    inter = line_intersections(lines, off_x, off_y, width, height, config)

    clusters = connected_component_clusters(
        inter.xy, inter.valid, config.cluster_eps
    )

    # corner gate: cluster centroid within `corner_threshold` of any scan point
    diff = clusters.centroid[:, None, :] - filtered[None, :, :]     # [C, N, 2]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(valid[None, :], d2, jnp.inf)
    near_scan = jnp.min(d2, axis=1) <= config.corner_threshold ** 2

    corner_valid = clusters.is_rep & near_scan
    return clusters.centroid, corner_valid


def measurements_from_corners(corners: jax.Array, corner_valid: jax.Array,
                              config: FastSLAMConfig) -> Measurements:
    """(x, y) corners -> padded (range, bearing) measurements from the origin."""
    dist = jnp.sqrt(jnp.sum(corners * corners, axis=-1))
    bearing = jnp.arctan2(corners[:, 1], corners[:, 0])

    # stable compaction: valid entries first, original order preserved
    c = corners.shape[0]
    order = jnp.argsort(jnp.where(corner_valid, 0, 1), stable=True)
    m = config.max_measurements
    take = order[:m]
    rb = jnp.stack([dist[take], bearing[take]], axis=-1)
    val = corner_valid[take]
    return Measurements(range_bearing=rb, valid=val)


def scan_to_measurements(points: jax.Array, valid: jax.Array,
                         config: FastSLAMConfig) -> Measurements:
    """The full front-end: ``[N, 2]`` scan -> padded measurement batch."""
    corners, corner_valid = extract_corners(points, valid, config)
    return measurements_from_corners(corners, corner_valid, config)
