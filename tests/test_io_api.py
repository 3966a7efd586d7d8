"""IO (serializer/checkpoint), reference-API facades, global map, viz."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastslam_tpu.config import FastSLAMConfig


# ------------------------------------------------------------- serializer

def test_serialize_deserialize_round_trip(tmp_path):
    from fastslam_tpu.io.serializer import deserialize_tick, serialize_tick

    path = str(tmp_path / "shared" / "fast_slam.json")
    particles = np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])
    serialize_tick(
        (1.0, 2.0, 0.5), (1.1, 2.1, 0.6), particles,
        [(3.0, 4.0)], {"distance": 0.14}, path=path,
    )
    snap = deserialize_tick(path)
    assert snap["estimated_robot_pos"] == (1.0, 2.0, 0.5)
    assert snap["actual_robot_pos"] == (1.1, 2.1, 0.6)
    assert snap["particles"] == [(0.1, 0.2, 0.3), (0.4, 0.5, 0.6)]
    assert snap["landmarks"] == [(3.0, 4.0)]
    assert snap["results"]["distance"] == 0.14


def test_deserialize_missing_and_corrupt(tmp_path):
    from fastslam_tpu.io.serializer import deserialize_tick

    assert deserialize_tick(str(tmp_path / "nope.json")) is None
    bad = tmp_path / "bad.json"
    bad.write_text("{ torn write")
    assert deserialize_tick(str(bad)) is None


def test_serialize_subsamples_particles(tmp_path):
    from fastslam_tpu.io.serializer import deserialize_tick, serialize_tick

    path = str(tmp_path / "fast_slam.json")
    particles = np.zeros((10_000, 3))
    serialize_tick((0, 0, 0), (0, 0, 0), particles, [], None, path=path,
                   max_particles=100)
    snap = deserialize_tick(path)
    assert len(snap["particles"]) == 100


# ------------------------------------------------------------- checkpoint

def test_checkpoint_round_trip(tmp_path):
    import jax

    from fastslam_tpu.core.state import init_state
    from fastslam_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    cfg = FastSLAMConfig(num_particles=16, max_landmarks=4)
    st = init_state(cfg, rng=3)
    st = st._replace(
        lm_count=jnp.full((16,), 2, jnp.int32),
        lm_mean=st.lm_mean.at[:, 0].set(1.5),
    )
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, st, iteration=42, robot_pose=np.array([1, 2, 0.3]))
    st2, meta = load_checkpoint(path)
    assert meta["iteration"] == 42
    np.testing.assert_allclose(meta["robot_pose"], [1, 2, 0.3])
    np.testing.assert_array_equal(np.asarray(st2.lm_count), np.asarray(st.lm_count))
    np.testing.assert_allclose(np.asarray(st2.lm_mean), np.asarray(st.lm_mean))
    # resumed RNG continues the same stream
    k1 = jax.random.normal(jax.random.fold_in(st.rng, 0), (3,))
    k2 = jax.random.normal(jax.random.fold_in(st2.rng, 0), (3,))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


# ------------------------------------------------------- reference API compat

def test_reference_public_api_surface():
    """Every name the reference exports must exist here
    (reference __init__.py:5-22)."""
    import fastslam_tpu as f

    for name in [
        "FastSLAM2", "HoughTransformation", "ICP", "LineFilter",
        "DirectedPoint", "Landmark", "Measurement", "Particle", "Point",
        "Robot", "EvaluationUtils", "GeometryUtils", "LandmarkUtils",
        "Serializer",
    ]:
        assert hasattr(f, name), f"missing public API name {name}"


def test_fastslam2_facade_iterate():
    from fastslam_tpu import FastSLAM2, Measurement

    slam = FastSLAM2(FastSLAMConfig(num_particles=16, max_landmarks=8))
    x, y, yaw = slam.iterate(0.0, 0.4, [Measurement(2.0, 0.3)])
    assert np.isfinite([x, y, yaw]).all()
    parts = slam.particles
    assert len(parts) == 16
    assert len(parts[0].landmarks) == 1
    # landmark roughly at robot + 2m in direction 0.3 (after ~0.4m translation)
    lm = parts[0].landmarks[0]
    assert abs(lm.x - (parts[0].x + 2.0 * np.cos(parts[0].yaw + 0.3))) < 1e-4


def test_geometry_utils_facade():
    from fastslam_tpu import GeometryUtils

    d = GeometryUtils.mahalanobis_distance(
        np.array([0.0, 0.0]), np.array([1.0, 0.0]), np.eye(2) * 0.25
    )
    assert d == pytest.approx(2.0)
    cents = GeometryUtils.cluster_points(
        [(0, 0), (0.1, 0), (5, 5), (5.1, 5)], eps=0.5, min_samples=1
    )
    assert len(cents) == 2
    dist, ang = GeometryUtils.calculate_distance_and_angle(1.0, 1.0)
    assert dist == pytest.approx(np.sqrt(2)) and ang == pytest.approx(np.pi / 4)


def test_landmark_utils_facade_end_to_end():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_frontend import _square_room_scan

    from fastslam_tpu import FastSLAM2, LandmarkUtils

    pts, valid = _square_room_scan()
    ms = LandmarkUtils.get_measurements_to_landmarks(pts[valid])
    assert len(ms) == 2

    cfg = FastSLAMConfig(num_particles=8, max_landmarks=8)
    slam = FastSLAM2(cfg)
    slam.iterate(0.0, 0.0, ms)
    LandmarkUtils.update_known_landmarks(slam)
    assert len(LandmarkUtils.known_landmarks) >= 1


def test_robot_facade_over_sim():
    from fastslam_tpu import EvaluationUtils, Robot
    from fastslam_tpu.drivers.sim_world import SimWorld

    world = SimWorld(seed=5)
    robot = Robot(world)
    pts = robot.scan_environment()
    assert pts.ndim == 2 and pts.shape[1] == 2 and pts.shape[0] > 100

    v, w = robot.move(0.3, 0.5)
    assert (v, w) in [(0.3, 0.0), (0.0, 0.5), (0.0, -0.5)]
    world.step()
    rot, trans = robot.get_transformation(v, w)
    if v != 0:
        assert rot == 0.0 and trans == pytest.approx(0.3 * world.dt * 0.6)

    ev = EvaluationUtils(world)
    ev.try_to_initialize()
    assert ev.initialized
    ev.set_actual_pos()
    from fastslam_tpu import DirectedPoint
    res, actual = ev.evaluate_estimation(DirectedPoint(0.0, 0.0, 0.0))
    assert res.distance < 0.2  # barely moved yet


def test_serializer_facade(tmp_path, monkeypatch):
    from fastslam_tpu import DirectedPoint, Landmark, Particle, Serializer
    from fastslam_tpu.io.serializer import deserialize_tick

    monkeypatch.setattr(Serializer, "shared_path", str(tmp_path))
    Serializer.serialize(
        DirectedPoint(1, 2, 0.3), DirectedPoint(1, 2, 0.31),
        [Particle(0, 0, 0, weight=1.0)], [Landmark(3, 4)], {"distance": 0.01},
    )
    snap = deserialize_tick(str(tmp_path / "fast_slam.json"))
    assert snap["landmarks"] == [(3.0, 4.0)]


# ------------------------------------------------------------------ viz

def test_plot_map_headless(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from fastslam_tpu.viz.map_plot import plot_map

    fig, ax = plot_map(
        (0, 0, 0), (0.1, 0, 0),
        [(0, 0, 0.1), (0.1, 0.1, 0.2)], [(1, 1)],
        {"average_deviation": 1.0, "distance": 0.1},
    )
    out = str(tmp_path / "map.png")
    fig.savefig(out)
    import os

    assert os.path.getsize(out) > 1000


def test_checkpoint_planes_round_trip(tmp_path):
    """PlanesState checkpoints natively (no layout conversion) and restores
    to the same trajectory as the state it saved."""
    import jax.numpy as jnp

    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.core import kernels
    from fastslam_tpu.core.state import init_planes_state, pad_measurements
    from fastslam_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    cfg = FastSLAMConfig(
        num_particles=128, max_landmarks=8, max_measurements=4,
        use_pallas=True, pallas_interpret=True,
    )
    st = init_planes_state(cfg, rng=3)
    ms = pad_measurements(cfg, [(2.0, 0.3), (3.5, -0.7)])
    st, _ = kernels.fastslam_step_planes(
        st, jnp.float32(0.0), jnp.float32(0.4), ms, cfg
    )
    p = str(tmp_path / "planes.npz")
    save_checkpoint(p, st, iteration=7)
    st2, meta = load_checkpoint(p)
    assert type(st2).__name__ == "PlanesState"
    assert meta["iteration"] == 7
    a, _ = kernels.fastslam_step_planes(
        st, jnp.float32(0.1), jnp.float32(0.0), ms, cfg
    )
    b, _ = kernels.fastslam_step_planes(
        st2, jnp.float32(0.1), jnp.float32(0.0), ms, cfg
    )
    np.testing.assert_array_equal(np.asarray(a.lm_mx), np.asarray(b.lm_mx))
    np.testing.assert_array_equal(np.asarray(a.poses), np.asarray(b.poses))
