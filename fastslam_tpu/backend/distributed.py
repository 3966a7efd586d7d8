"""Distributed pose-graph optimization: Schur complement over a map-axis mesh.

BASELINE.json config #5: 1M landmarks in blocks + pose-graph backend via
distributed Schur complement.  The structure (see backend.pose_graph):

* landmark slots and their observation factors shard over the mesh's map
  axis — ``landmark_system`` is embarrassingly shard-local (per-landmark 2x2
  Hll inverses, per-shard Hpl blocks);
* the reduced pose system is tiny ([3K, 3K] for K keyframes), so each
  shard's partial ``(hpp_diag, bp_obs, cross, rs_corr)`` is ``psum``-ed over
  the map axis and the solve happens replicated;
* back-substitution of landmark updates is again shard-local.

Factor-to-shard placement: the builder emits factors sorted by landmark
index; ``shard_pose_graph`` re-buckets them so each factor lives on the shard
owning its landmark (obs_lm becomes a local slot index).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from fastslam_tpu.backend.pose_graph import (
    PoseGraph,
    backsubstitute_landmarks,
    landmark_system,
    pose_system,
    wrap_angle,
)


def shard_pose_graph(g: PoseGraph, num_shards: int) -> Tuple[PoseGraph, int]:
    """Re-bucket landmarks/factors so shard s owns landmark slots
    [s*L/n, (s+1)*L/n) and exactly the factors that observe them.

    Returns ``(graph, dropped)``: a PoseGraph whose landmark/factor arrays
    are permutations with per-shard-local factor capacity (obs_lm stays a
    GLOBAL slot index; the shard-local conversion happens inside the
    shard_map body), and the number of valid factors that did NOT fit their
    owning shard's static capacity (``F/num_shards``).  ``dropped > 0``
    weakens the optimization — it also triggers a warning; rebalance
    landmark slots or raise ``max_factors`` to avoid it.
    """
    l = g.landmarks.shape[0]
    f = g.obs_kf.shape[0]
    assert l % num_shards == 0, "landmark capacity must divide the mesh"
    per_shard_l = l // num_shards
    per_shard_f = f // num_shards

    obs_lm = np.asarray(g.obs_lm)
    obs_valid = np.asarray(g.obs_valid)
    shard_of = obs_lm // per_shard_l

    # bucket factors by owning shard; overflow drops (capacity is static).
    # vectorized: stable-sort valid factors by shard, then clamp each
    # shard's run to its capacity
    pad_slot = int(np.argmin(obs_valid)) if not obs_valid.all() else 0
    order = np.full(f, pad_slot, np.int64)
    new_valid = np.zeros(f, bool)
    valid_idx = np.flatnonzero(obs_valid)
    by_shard = valid_idx[np.argsort(shard_of[valid_idx], kind="stable")]
    shard_sizes = np.bincount(shard_of[valid_idx], minlength=num_shards)
    starts = np.concatenate([[0], np.cumsum(shard_sizes)[:-1]])
    taken = np.minimum(shard_sizes, per_shard_f)
    dropped = int(np.sum(shard_sizes - taken))
    for s in range(num_shards):
        n = int(taken[s])
        dst = s * per_shard_f
        order[dst: dst + n] = by_shard[int(starts[s]): int(starts[s]) + n]
        new_valid[dst: dst + n] = True

    if dropped:
        import warnings

        warnings.warn(
            f"shard_pose_graph: {dropped} valid factors overflowed their "
            f"owning shard's capacity ({per_shard_f}/shard) and were "
            "DROPPED — the optimization is weakened; rebalance landmark "
            "slots or raise max_factors",
            stacklevel=2,
        )

    return g._replace(
        obs_kf=jnp.asarray(np.asarray(g.obs_kf)[order]),
        obs_lm=jnp.asarray(obs_lm[order]),
        obs_rb=jnp.asarray(np.asarray(g.obs_rb)[order]),
        obs_info=jnp.asarray(np.asarray(g.obs_info)[order]),
        obs_valid=jnp.asarray(new_valid),
    ), dropped


def build_schur_pairs(g: PoseGraph, num_shards: int):
    """Ordered same-landmark factor-pair lists for the SPARSE Schur path
    (:func:`~fastslam_tpu.backend.pose_graph.landmark_system_sparse`).

    For every landmark with c observing factors the cross term needs all
    c^2 ordered factor pairs.  Host-side numpy over the ALREADY-SHARDED
    graph (factor slot s*F/n..(s+1)*F/n belongs to shard s): per shard,
    sort its valid factors by landmark id, enumerate pairs within each
    equal-landmark run, pad every shard to the common capacity with masked
    (0, 0) pairs.

    Returns ``(pair_a, pair_b, pair_valid)`` as ``[n_shards * cap]`` arrays
    of SHARD-LOCAL factor slot indices, ready to shard on the map axis.
    """
    f = g.obs_kf.shape[0]
    per_shard_f = f // num_shards
    obs_lm = np.asarray(g.obs_lm)
    obs_valid = np.asarray(g.obs_valid)

    per_shard = []
    for s in range(num_shards):
        lo = s * per_shard_f
        valid = np.flatnonzero(obs_valid[lo: lo + per_shard_f])
        if valid.size == 0:
            per_shard.append((np.zeros(0, np.int32), np.zeros(0, np.int32)))
            continue
        lm = obs_lm[lo + valid]
        order = np.argsort(lm, kind="stable")
        sorted_idx = valid[order].astype(np.int32)
        lm_sorted = lm[order]
        _, counts = np.unique(lm_sorted, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        c2 = counts * counts
        total = int(c2.sum())
        pair_starts = np.concatenate([[0], np.cumsum(c2)[:-1]])
        base = np.repeat(starts, c2)
        q = np.arange(total) - np.repeat(pair_starts, c2)
        c_rep = np.repeat(counts, c2)
        pa = sorted_idx[base + q // c_rep]
        pb = sorted_idx[base + q % c_rep]
        per_shard.append((pa, pb))

    cap = max(8, max((len(pa) for pa, _ in per_shard), default=8))
    cap = -(-cap // 8) * 8
    pair_a = np.zeros((num_shards, cap), np.int32)
    pair_b = np.zeros((num_shards, cap), np.int32)
    pair_valid = np.zeros((num_shards, cap), bool)
    for s, (pa, pb) in enumerate(per_shard):
        pair_a[s, : len(pa)] = pa
        pair_b[s, : len(pb)] = pb
        pair_valid[s, : len(pa)] = True
    return (jnp.asarray(pair_a.reshape(-1)),
            jnp.asarray(pair_b.reshape(-1)),
            jnp.asarray(pair_valid.reshape(-1)))


def make_sharded_gn_step(mesh: Mesh, map_axis: str = "map",
                         sparse: bool = True):
    """Compile one distributed damped-GN step.

    Sharding: poses replicated; landmarks + observation factors on the map
    axis.  Collective cost per iteration: one psum of
    [K,3,3]+[K,3]+[K,K,3,3]+[K,3] — independent of landmark count.

    ``sparse=True`` (default) uses the factor-pair Schur reduction —
    O(F + K^2) memory, required at 1M landmarks where the dense [K, L]
    assembly alone exceeds host/device memory; the step then takes the
    ``(pair_a, pair_b, pair_valid)`` arrays from :func:`build_schur_pairs`.
    ``sparse=False`` keeps the dense MXU-einsum path (fine for small maps).
    """
    from fastslam_tpu.backend.pose_graph import (
        backsubstitute_landmarks_sparse, landmark_system_sparse,
    )

    def local_body(poses, landmarks, odo_rel, odo_info, odo_valid,
                   obs_kf, obs_lm, obs_rb, obs_info, obs_valid,
                   prior_info, damping, *pairs):
        k = poses.shape[0]
        shard = jax.lax.axis_index(map_axis)
        l_local = landmarks.shape[0]
        # global -> local landmark slot ids
        local_lm = obs_lm - shard * l_local

        g_local = PoseGraph(
            poses=poses, landmarks=landmarks,
            lm_valid=jnp.ones(l_local, bool),
            odo_rel=odo_rel, odo_info=odo_info, odo_valid=odo_valid,
            obs_kf=obs_kf, obs_lm=local_lm, obs_rb=obs_rb,
            obs_info=obs_info, obs_valid=obs_valid,
            prior_info=prior_info,
        )

        if sparse:
            pair_a, pair_b, pair_valid = pairs
            hpp_diag, bp_obs, cross, rs_corr, hll_inv, bl, hpl_f = (
                landmark_system_sparse(poses, landmarks, g_local, damping,
                                       pair_a, pair_b, pair_valid)
            )
        else:
            hpp_diag, bp_obs, cross, rs_corr, hll_inv, bl, hpl_dense = (
                landmark_system(poses, landmarks, g_local, damping)
            )
        hpp_diag, bp_obs, cross, rs_corr = jax.lax.psum(
            (hpp_diag, bp_obs, cross, rs_corr), map_axis
        )

        big_h, bp = pose_system(poses, g_local, damping)
        big_h = big_h.at[jnp.arange(k), jnp.arange(k)].add(hpp_diag) - cross
        rs = (bp + bp_obs - rs_corr).reshape(3 * k)
        s_mat = big_h.transpose(0, 2, 1, 3).reshape(3 * k, 3 * k)

        dp = jax.scipy.linalg.solve(s_mat, rs, assume_a="pos").reshape(k, 3)
        if sparse:
            dl = backsubstitute_landmarks_sparse(dp, hll_inv, bl, hpl_f,
                                                 g_local)
        else:
            dl = backsubstitute_landmarks(dp, hll_inv, bl, hpl_dense)

        new_poses = poses + dp
        new_poses = new_poses.at[:, 2].set(wrap_angle(new_poses[:, 2]))
        return new_poses, landmarks + dl

    mspec = P(map_axis)
    r = P()
    pair_specs = (mspec, mspec, mspec) if sparse else ()
    body = shard_map(
        local_body, mesh=mesh,
        in_specs=(r, mspec, r, r, r, mspec, mspec, mspec, mspec, mspec, r, r)
        + pair_specs,
        out_specs=(r, mspec),
        check_vma=False,
    )

    if sparse:
        @jax.jit
        def step(g: PoseGraph, damping, pair_a, pair_b, pair_valid):
            return body(
                g.poses, g.landmarks, g.odo_rel, g.odo_info, g.odo_valid,
                g.obs_kf, g.obs_lm, g.obs_rb, g.obs_info, g.obs_valid,
                g.prior_info, damping, pair_a, pair_b, pair_valid,
            )
    else:
        @jax.jit
        def step(g: PoseGraph, damping):
            return body(
                g.poses, g.landmarks, g.odo_rel, g.odo_info, g.odo_valid,
                g.obs_kf, g.obs_lm, g.obs_rb, g.obs_info, g.obs_valid,
                g.prior_info, damping,
            )

    return step


def optimize_sharded(g: PoseGraph, mesh: Mesh, num_iters: int = 10,
                     damping: float = 1e-6, map_axis: str = "map",
                     sparse: bool = True):
    """LM loop over the distributed GN step (host-side accept/reject).

    ``sparse=True`` (default) runs the factor-pair Schur reduction — the
    O(F + K^2)-memory path that handles 1M-landmark graphs; ``sparse=False``
    keeps the dense [K, L] assembly (small maps only)."""
    from fastslam_tpu.backend.pose_graph import total_error

    num_shards = mesh.shape[map_axis]
    g, _dropped = shard_pose_graph(g, num_shards)
    step = make_sharded_gn_step(mesh, map_axis, sparse=sparse)
    extra = build_schur_pairs(g, num_shards) if sparse else ()

    err = float(total_error(g.poses, g.landmarks, g))
    lam = damping
    poses, landmarks = g.poses, g.landmarks
    for _ in range(num_iters):
        new_p, new_l = step(g._replace(poses=poses, landmarks=landmarks),
                            jnp.float32(lam), *extra)
        new_err = float(total_error(new_p, new_l, g))
        if new_err < err:
            poses, landmarks, err, lam = new_p, new_l, new_err, lam * 0.5
        else:
            lam *= 10.0
    return poses, landmarks, err
