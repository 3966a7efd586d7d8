"""Corner identity tracking across ticks.

The reference re-detects corners from scratch every scan and relies on the
filter's Mahalanobis gate to re-associate them (``landmark_utils.py:92-117``)
— a single-frame Hough flicker (a corner detected in one tick, missed or
displaced in the next) becomes a spurious landmark append in every particle's
map.  This tracker sits between the corner detector and the filter:

* a fixed-capacity track table lives in the robot frame and is ego-motion
  compensated each tick with the command odometry (the same exclusive
  rotation-XOR-translation model the filter propagates with);
* detections within the gate of a predicted track refresh it (EMA position,
  hit count up, miss count reset) under mutual-nearest matching; unmatched
  detections open new tracks in free slots; tracks missed too many times die;
* only corners whose track has been confirmed ``min_hits`` times are emitted
  — one-frame flickers never reach the filter — and each carries a stable
  track id that downstream consumers (e.g. the pose-graph builder) can use
  as a landmark identity instead of re-clustering.

Everything is masked fixed-shape array math under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TrackState(NamedTuple):
    pos: jax.Array      # [K, 2] track position, robot frame
    hits: jax.Array     # [K] int32 confirmations
    misses: jax.Array   # [K] int32 consecutive misses
    track_id: jax.Array # [K] int32 persistent id (-1 = free slot)
    next_id: jax.Array  # scalar int32


def init_tracks(capacity: int, dtype=jnp.float32) -> TrackState:
    return TrackState(
        pos=jnp.zeros((capacity, 2), dtype),
        hits=jnp.zeros((capacity,), jnp.int32),
        misses=jnp.zeros((capacity,), jnp.int32),
        track_id=jnp.full((capacity,), -1, jnp.int32),
        next_id=jnp.int32(0),
    )


def _ego_compensate(pos: jax.Array, rotation: jax.Array,
                    translation: jax.Array) -> jax.Array:
    """Predict where robot-frame points land after the robot moves.

    Motion model matches the filter (``core/kernels.propagate_particles``):
    per tick the robot either rotates by ``rotation`` or translates
    ``translation`` along its (new) heading, so points transform by
    ``p' = R(-rotation) p - (translation, 0)``.
    """
    c = jnp.cos(-rotation)
    s = jnp.sin(-rotation)
    x = c * pos[:, 0] - s * pos[:, 1] - translation
    y = s * pos[:, 0] + c * pos[:, 1]
    return jnp.stack([x, y], axis=-1)


def update_tracks(
    tracks: TrackState,
    corners: jax.Array,       # [C, 2] robot-frame detections
    corner_valid: jax.Array,  # [C] bool
    rotation: jax.Array,
    translation: jax.Array,
    *,
    gate: float = 0.4,
    ema: float = 1.0,
    max_misses: int = 3,
) -> TrackState:
    """One tracking tick: predict, mutually match, refresh/open/kill."""
    k = tracks.pos.shape[0]
    c = corners.shape[0]
    alive = tracks.track_id >= 0

    pred = _ego_compensate(tracks.pos, rotation, translation)     # [K, 2]

    diff = pred[:, None, :] - corners[None, :, :]                 # [K, C, 2]
    d2 = jnp.sum(diff * diff, axis=-1)
    big = jnp.asarray(1e12, d2.dtype)
    d2 = jnp.where(alive[:, None] & corner_valid[None, :], d2, big)

    # mutual nearest neighbours within the gate
    best_c = jnp.argmin(d2, axis=1)                               # [K]
    best_t = jnp.argmin(d2, axis=0)                               # [C]
    t_iota = jnp.arange(k)
    mutual = (best_t[best_c] == t_iota) & (
        jnp.take_along_axis(d2, best_c[:, None], axis=1)[:, 0] < gate * gate
    )
    matched_t = mutual & alive                                    # [K]
    matched_c = jnp.zeros((c,), bool).at[best_c].max(matched_t)   # [C]

    # refresh matched tracks
    obs = corners[best_c]                                         # [K, 2]
    new_pos = jnp.where(matched_t[:, None],
                        (1.0 - ema) * pred + ema * obs, pred)
    hits = jnp.where(matched_t, tracks.hits + 1, tracks.hits)
    misses = jnp.where(matched_t, 0, tracks.misses + 1)

    # kill stale tracks
    dead = alive & (misses > max_misses)
    track_id = jnp.where(dead, -1, tracks.track_id)
    hits = jnp.where(dead, 0, hits)
    alive = track_id >= 0

    # open new tracks for unmatched detections at free slots
    to_open = corner_valid & ~matched_c                           # [C]
    free = ~alive                                                 # [K]
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1            # [K]
    open_rank = jnp.cumsum(to_open.astype(jnp.int32)) - 1         # [C]
    n_free = jnp.sum(free.astype(jnp.int32))
    # corner with open_rank r goes to the r-th free slot
    slot_of_rank = jnp.full((k,), k, jnp.int32).at[
        jnp.where(free, free_rank, k)
    ].set(t_iota, mode="drop")                                    # [K] rank->slot
    corner_slot = jnp.where(
        to_open & (open_rank < n_free),
        slot_of_rank[jnp.clip(open_rank, 0, k - 1)],
        k,
    )                                                             # [C] -> slot or K
    new_pos = new_pos.at[corner_slot].set(corners, mode="drop")
    hits = hits.at[corner_slot].set(1, mode="drop")
    misses = misses.at[corner_slot].set(0, mode="drop")
    opened = to_open & (open_rank < n_free)
    new_ids = tracks.next_id + open_rank.astype(jnp.int32)
    track_id = track_id.at[corner_slot].set(
        jnp.where(opened, new_ids, -1), mode="drop"
    )
    next_id = tracks.next_id + jnp.sum(opened.astype(jnp.int32))

    return TrackState(pos=new_pos, hits=hits, misses=misses,
                      track_id=track_id, next_id=next_id)


def stable_corners(
    tracks: TrackState, *, min_hits: int = 2
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Confirmed corners only.

    Returns ``(pos [K, 2], ids [K], valid [K])`` — robot-frame positions of
    tracks seen at least ``min_hits`` times and not currently missing.
    """
    ok = (tracks.track_id >= 0) & (tracks.hits >= min_hits) & (
        tracks.misses == 0
    )
    return tracks.pos, tracks.track_id, ok
