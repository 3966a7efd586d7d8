"""Sharded filter step: the full FastSLAM iteration over a device mesh.

Strategy (idiomatic XLA/GSPMD, per the scaling-book recipe):

* state arrays carry a NamedSharding on the particle axis
  (:func:`fastslam_tpu.parallel.mesh.state_sharding`);
* the step function is ``jax.jit``-ed with matching in/out shardings plus
  ``lax.with_sharding_constraint`` pins inside, and XLA inserts the
  collectives: the weight-sum and Neff reductions become ``all-reduce``,
  the resampling ancestor gather becomes a cross-shard ``all-gather`` /
  ``collective-permute`` of particle blocks (landmark means + covariances
  travel with their particle, replacing the reference's deepcopy at
  ``fast_slam_2.py:196``), and the argmax pose estimate becomes a global
  ``all-reduce(max)``.

The same compiled program runs on 1 chip (collectives no-op) or a pod slice;
CI exercises it on 8 virtual CPU devices.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core import kernels
from fastslam_tpu.core.state import FilterState, Measurements
from fastslam_tpu.parallel.mesh import state_sharding


def _constrained_step(
    state: FilterState,
    rotation: jax.Array,
    translation: jax.Array,
    measurements: Measurements,
    config: FastSLAMConfig,
    mesh: Mesh,
) -> Tuple[FilterState, jax.Array]:
    """fastslam_step with explicit sharding pins on the carried state."""
    shardings = state_sharding(mesh, config)

    def pin(s: FilterState) -> FilterState:
        return jax.tree.map(jax.lax.with_sharding_constraint, s, shardings)

    state = pin(state)
    new_state, pose = kernels.fastslam_step(
        state, rotation, translation, measurements, config
    )
    return pin(new_state), pose


def make_sharded_step(config: FastSLAMConfig, mesh: Mesh):
    """Compile the full filter step for the mesh.

    Returns ``step(state, rotation, translation, measurements)`` with state
    sharded over ``config.particle_axis`` and the pose estimate replicated.
    """
    shardings = state_sharding(mesh, config)
    repl = NamedSharding(mesh, P())
    ms_sharding = Measurements(range_bearing=repl, valid=repl)
    return jax.jit(
        partial(_constrained_step, config=config, mesh=mesh),
        in_shardings=(shardings, repl, repl, ms_sharding),
        out_shardings=(shardings, repl),
    )
