"""Global landmark map for visualization — DBSCAN merge across particles.

The reference maintains ``LandmarkUtils.known_landmarks`` by clustering every
particle's landmarks with DBSCAN(eps=0.5, min_samples=0.7 * avg landmarks per
particle) each tick (``landmark_utils.py:120-144``).  Here that is a jitted
dense clustering over the SoA landmark block, with a particle subsample cap so
the O(n^2) adjacency stays bounded at 100k particles (the reference's 20
particles never had that problem).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core.state import FilterState
from fastslam_tpu.frontend.clustering import dbscan_clusters


def cluster_known_landmarks(
    state: FilterState, config: FastSLAMConfig, max_particles: int = 32
) -> Tuple[jax.Array, jax.Array]:
    """Cluster all particles' landmarks into a global map.

    Returns ``(centroids [K, 2], valid [K])`` where ``K = min(P, max_particles)
    * L``.  min_samples follows the reference formula scaled to the subsample:
    ``0.7 * avg landmarks per (sampled) particle`` (landmark_utils.py:131-139);
    clustering is skipped (empty result) when min_samples < 1, as there.
    """
    p = state.num_particles
    n_sample = min(p, max_particles)
    stride = max(p // n_sample, 1)
    sel = jnp.arange(n_sample) * stride

    mean = state.lm_mean[sel].reshape(-1, 2)             # [n*L, 2]
    valid = state.lm_valid_mask()[sel].reshape(-1)       # [n*L]

    total = jnp.sum(valid)
    avg = total / n_sample
    min_samples = jnp.floor(avg * config.viz_min_samples_frac).astype(jnp.int32)

    cl = dbscan_clusters(mean, valid, config.viz_cluster_eps, min_samples)
    ok = cl.is_rep & (min_samples >= 1)
    return cl.centroid, ok
