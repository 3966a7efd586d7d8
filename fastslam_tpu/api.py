"""Reference-compatible API facades.

The reference's entire public surface is 14 names re-exported from
``fast_slam_2/__init__.py:5-22``: ``FastSLAM2, HoughTransformation, ICP,
LineFilter, DirectedPoint, Landmark, Measurement, Particle, Point, Robot,
EvaluationUtils, GeometryUtils, LandmarkUtils, Serializer``.  This module
provides drop-in equivalents of the algorithm/utility classes, each a thin
host-facing wrapper over the jitted SoA engine.  A user of the reference can
switch imports to ``fastslam_tpu`` and keep their call sites.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastslam_tpu.config import DEFAULT_CONFIG, FastSLAMConfig
from fastslam_tpu.core import kernels
from fastslam_tpu.core.state import FilterState, init_state, pad_measurements
from fastslam_tpu.frontend import clustering as _clustering
from fastslam_tpu.frontend import pipeline as _pipeline
from fastslam_tpu.frontend.global_map import cluster_known_landmarks
from fastslam_tpu.frontend.line_filter import line_filter as _line_filter
from fastslam_tpu.models import Landmark, Measurement, Particle
from fastslam_tpu.proposal import icp as _icp


class FastSLAM2:
    """Drop-in equivalent of the reference ``FastSLAM2`` class
    (``fast_slam_2/algorithms/fast_slam_2.py:15-67``): construct, then call
    ``iterate(rotation, translation, measurements)`` per tick and read
    ``.particles``.  Internally one jitted XLA program over SoA state."""

    def __init__(self, config: FastSLAMConfig = DEFAULT_CONFIG, rng: int = 0):
        self.config = config
        self.state: FilterState = init_state(config, rng)
        self._step = jax.jit(
            lambda st, rot, trans, ms: kernels.fastslam_step(
                st, rot, trans, ms, config
            )
        )

    def iterate(
        self,
        rotation: float,
        translation: float,
        measurements: List[Measurement],
    ) -> Tuple[float, float, float]:
        """One filter iteration; returns the estimated (x, y, yaw)."""
        rb = [(m.distance, m.yaw) for m in measurements]
        ms = pad_measurements(self.config, np.asarray(rb, np.float32).reshape(-1, 2))
        self.state, pose = self._step(
            self.state, jnp.float32(rotation), jnp.float32(translation), ms
        )
        x, y, yaw = np.asarray(pose)
        return float(x), float(y), float(yaw)

    @property
    def particles(self) -> List[Particle]:
        """AoS particle views (materializes device state — viz/debug only)."""
        return Particle.from_state(self.state)


class LineFilter:
    """Reference ``LineFilter`` (``algorithms/line_filter.py:6-21``)."""

    @staticmethod
    def filter(points: np.ndarray, sigma: float = 0.1) -> np.ndarray:
        cfg = DEFAULT_CONFIG.replace(line_filter_sigma=float(sigma))
        return np.asarray(_line_filter(jnp.asarray(points, jnp.float32), cfg))


class HoughTransformation:
    """Reference ``HoughTransformation`` (``algorithms/hough_transformation.py``):
    returns metric-space line-intersection points for a scan."""

    @staticmethod
    def detect_line_intersections(
        points: np.ndarray, config: FastSLAMConfig = DEFAULT_CONFIG
    ) -> List[Tuple[float, float]]:
        from fastslam_tpu.frontend.hough import hough_lines, line_intersections

        pts = jnp.asarray(points, jnp.float32)
        valid = jnp.ones(pts.shape[0], bool)
        lines, ox, oy, w, h = hough_lines(pts, valid, config)
        inter = line_intersections(lines, ox, oy, w, h, config)
        mask = np.asarray(inter.valid)
        return [tuple(map(float, xy)) for xy in np.asarray(inter.xy)[mask]]


class ICP:
    """Reference ``ICP`` (``algorithms/icp.py:5-89``)."""

    @staticmethod
    def get_transformation(
        source_points: np.ndarray,
        target_points: np.ndarray,
        max_iterations: int = 100,
        threshold: float = 1e-5,
    ) -> Tuple[np.ndarray, np.ndarray]:
        cfg = DEFAULT_CONFIG.replace(
            icp_max_iterations=max_iterations, icp_tolerance=threshold
        )
        src = jnp.asarray(source_points, jnp.float32)
        tgt = jnp.asarray(target_points, jnp.float32)
        res = _icp.icp(
            src, tgt,
            jnp.ones(src.shape[0], bool), jnp.ones(tgt.shape[0], bool), cfg,
        )
        return np.asarray(res.rotation), np.asarray(res.translation)


class GeometryUtils:
    """Reference ``GeometryUtils`` (``utils/geometry_utils.py``)."""

    @staticmethod
    def mahalanobis_distance(position_a, position_b, covariance_matrix) -> float:
        a = np.asarray(position_a, float)
        b = np.asarray(position_b, float)
        delta = b - a
        return float(np.sqrt(delta @ np.linalg.inv(np.asarray(covariance_matrix)) @ delta))

    @staticmethod
    def cluster_points(
        point_lists, eps: float, min_samples: int
    ) -> List[Tuple[float, float]]:
        pts = jnp.asarray(np.asarray(point_lists, np.float32).reshape(-1, 2))
        valid = jnp.ones(pts.shape[0], bool)
        if min_samples <= 1:
            cl = _clustering.connected_component_clusters(pts, valid, eps)
        else:
            cl = _clustering.dbscan_clusters(pts, valid, eps, jnp.int32(min_samples))
        rep = np.asarray(cl.is_rep)
        return [tuple(map(float, c)) for c in np.asarray(cl.centroid)[rep]]

    @staticmethod
    def calculate_distance_and_angle(x: float, y: float) -> Tuple[float, float]:
        return float(np.hypot(x, y)), float(np.arctan2(y, x))


class LandmarkUtils:
    """Reference ``LandmarkUtils`` (``utils/landmark_utils.py``)."""

    known_landmarks: List[Landmark] = []

    _frontend_cache = {}

    @classmethod
    def get_measurements_to_landmarks(
        cls, scanned_points: np.ndarray, config: FastSLAMConfig = DEFAULT_CONFIG
    ) -> List[Measurement]:
        """Scan points -> corner measurements (landmark_utils.py:21-38)."""
        key = id(config)
        fn = cls._frontend_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda p, v: _pipeline.scan_to_measurements(p, v, config))
            cls._frontend_cache[key] = fn
        n = scanned_points.shape[0]
        pts = np.zeros((config.num_beams, 2), np.float32)
        valid = np.zeros(config.num_beams, bool)
        m = min(n, config.num_beams)
        pts[:m] = scanned_points[:m]
        valid[:m] = True
        ms = fn(jnp.asarray(pts), jnp.asarray(valid))
        mask = np.asarray(ms.valid)
        rb = np.asarray(ms.range_bearing)[mask]
        return [Measurement(float(d), float(b)) for d, b in rb]

    @staticmethod
    def associate_landmarks(
        observed_landmark: Landmark, particle_landmarks: List[Landmark],
        gate: float = DEFAULT_CONFIG.max_landmark_distance,
    ) -> Tuple[Optional[Landmark], Optional[int]]:
        """First-match-under-gate scan (landmark_utils.py:92-117)."""
        obs = observed_landmark.as_vector()
        for i, lm in enumerate(particle_landmarks):
            d = GeometryUtils.mahalanobis_distance(lm.as_vector(), obs, lm.cov)
            if d < gate:
                return lm, i
        return None, None

    @classmethod
    def update_known_landmarks(cls, slam: "FastSLAM2") -> None:
        """Re-cluster all particles' landmarks into the global viz map
        (landmark_utils.py:120-144)."""
        cents, ok = cluster_known_landmarks(slam.state, slam.config)
        mask = np.asarray(ok)
        cls.known_landmarks = [
            Landmark(float(x), float(y)) for x, y in np.asarray(cents)[mask]
        ]
