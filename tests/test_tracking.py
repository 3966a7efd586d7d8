"""Corner identity tracking: persistence, flicker rejection, ego compensation."""

import numpy as np
import jax
import jax.numpy as jnp

from fastslam_tpu.frontend.tracking import (
    init_tracks,
    stable_corners,
    update_tracks,
)


def pad(corners, cap=8):
    arr = np.zeros((cap, 2), np.float32)
    v = np.zeros(cap, bool)
    n = len(corners)
    arr[:n] = corners
    v[:n] = True
    return jnp.asarray(arr), jnp.asarray(v)


def test_persistent_corner_confirms_and_keeps_id():
    tr = init_tracks(16)
    c, v = pad([[2.0, 1.0], [3.0, -0.5]])
    for _ in range(3):
        tr = update_tracks(tr, c, v, jnp.float32(0.0), jnp.float32(0.0))
    pos, ids, ok = stable_corners(tr, min_hits=2)
    got_ids = np.asarray(ids)[np.asarray(ok)]
    got_pos = np.asarray(pos)[np.asarray(ok)]
    assert len(got_ids) == 2
    assert set(got_ids) == {0, 1}  # ids stable across ticks
    np.testing.assert_allclose(
        got_pos[np.argsort(got_pos[:, 0])], [[2.0, 1.0], [3.0, -0.5]],
        atol=1e-5,
    )


def test_one_frame_flicker_never_emitted():
    tr = init_tracks(16)
    steady, sv = pad([[2.0, 1.0]])
    with_flicker, fv = pad([[2.0, 1.0], [-1.0, 4.0]])
    tr = update_tracks(tr, steady, sv, jnp.float32(0.0), jnp.float32(0.0))
    tr = update_tracks(tr, with_flicker, fv, jnp.float32(0.0), jnp.float32(0.0))
    tr = update_tracks(tr, steady, sv, jnp.float32(0.0), jnp.float32(0.0))
    pos, ids, ok = stable_corners(tr, min_hits=2)
    got = np.asarray(pos)[np.asarray(ok)]
    assert got.shape[0] == 1  # the flicker at (-1, 4) was never confirmed
    np.testing.assert_allclose(got[0], [2.0, 1.0], atol=1e-5)


def test_ego_motion_compensation_translation():
    """Robot advances 0.5 m per tick; a fixed world corner should stay one
    coherent track whose robot-frame x decreases by 0.5 each tick."""
    tr = init_tracks(16)
    for i in range(4):
        x = 3.0 - 0.5 * i
        c, v = pad([[x, 1.0]])
        tr = update_tracks(tr, c, v, jnp.float32(0.0),
                           jnp.float32(0.5 if i else 0.0), gate=0.3)
    pos, ids, ok = stable_corners(tr, min_hits=3)
    got_ids = np.asarray(ids)[np.asarray(ok)]
    assert len(got_ids) == 1 and got_ids[0] == 0
    np.testing.assert_allclose(
        np.asarray(pos)[np.asarray(ok)][0], [1.5, 1.0], atol=1e-5
    )


def test_ego_motion_compensation_rotation():
    tr = init_tracks(16)
    th = 0.3
    p0 = np.array([2.0, 0.5])
    for i in range(4):
        ang = -th * i
        c_, s_ = np.cos(ang), np.sin(ang)
        p = np.array([c_ * p0[0] - s_ * p0[1], s_ * p0[0] + c_ * p0[1]])
        c, v = pad([p])
        tr = update_tracks(tr, c, v, jnp.float32(th if i else 0.0),
                           jnp.float32(0.0), gate=0.3)
    pos, ids, ok = stable_corners(tr, min_hits=3)
    assert int(np.asarray(ok).sum()) == 1
    assert np.asarray(ids)[np.asarray(ok)][0] == 0


def test_missed_tracks_die_and_slots_recycle():
    tr = init_tracks(4)
    c, v = pad([[2.0, 1.0]], cap=4)
    for _ in range(2):
        tr = update_tracks(tr, c, v, jnp.float32(0.0), jnp.float32(0.0))
    empty = jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool)
    for _ in range(5):  # > max_misses
        tr = update_tracks(tr, empty[0], empty[1], jnp.float32(0.0),
                           jnp.float32(0.0))
    assert int((tr.track_id >= 0).sum()) == 0
    # new corner takes a recycled slot with a NEW id
    c2, v2 = pad([[0.5, 0.5]], cap=4)
    for _ in range(2):
        tr = update_tracks(tr, c2, v2, jnp.float32(0.0), jnp.float32(0.0))
    pos, ids, ok = stable_corners(tr)
    got = np.asarray(ids)[np.asarray(ok)]
    assert len(got) == 1 and got[0] > 0


def test_capacity_overflow_drops_excess():
    tr = init_tracks(2)
    c, v = pad([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0]], cap=4)
    tr = update_tracks(tr, c, v, jnp.float32(0.0), jnp.float32(0.0))
    assert int((tr.track_id >= 0).sum()) == 2  # third dropped, no crash


def test_jit_compatible():
    tr = init_tracks(8)
    c, v = pad([[2.0, 1.0]])
    f = jax.jit(lambda t, c, v: update_tracks(
        t, c, v, jnp.float32(0.0), jnp.float32(0.0)))
    tr = f(tr, c, v)
    tr = f(tr, c, v)
    pos, ids, ok = stable_corners(tr)
    assert int(np.asarray(ok).sum()) == 1
