"""PROTOTYPE: Pallas ring-collective halo exchange for distributed resampling.

``parallel/resample.py`` implements halo-exchange systematic resampling with
two XLA ``ppermute`` collectives (left + right neighbor blocks).  XLA
schedules those as two dependent collective ops; on real multi-chip hardware
the ICI links are full-duplex, so a hand-written kernel that issues BOTH
remote DMAs concurrently (clockwise + counter-clockwise) can hide one full
block transfer behind the other — the bi-directional ring pattern.

This module is that kernel, plus a drop-in resampler built on it:

* ``ring_halo_exchange`` — one Pallas kernel per shard that RDMAs the local
  packed particle block into both neighbors' receive buffers
  (``pltpu.make_async_remote_copy``, logical device ids on the particle
  mesh axis), with a neighbor barrier up front so no shard writes into a
  buffer before its owner has entered the kernel.
* ``ring_halo_resample`` — packs the filter state into one ``[P_local, D]``
  f32 block (poses | logw | lm_mean | lm_cov | lm_count), exchanges halos
  through the kernel, then gathers systematic-resampling ancestors from the
  3-block window exactly like ``resample.halo_systematic_resample`` (same
  psum'd full-gather fallback on degenerate ticks).

STATUS: compiled + executed on the single available chip (a 1-shard ring:
both neighbors are self, the exchange degenerates to two local copies, and
the result is validated against the single-device resampler).  TRUE
multi-chip validation — concurrency of the two RDMA directions, barrier
correctness across >1 devices — REQUIRES real multi-chip hardware and is
explicitly deferred; this environment exposes one chip behind a tunnel.
The CPU backend cannot lower remote DMAs at all, so the production default
remains ``resample.halo_systematic_resample`` (config.distributed_resample)
until a pod validates this path.

Reference: greenfield (the reference resamples serially on one host,
fast_slam_2.py:177-199); ring pattern per the Pallas TPU guide.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core.state import FilterState

_RING_COLLECTIVE_ID = 11


def _exchange_kernel(block_ref, left_ref, right_ref, send_sem, recv_sem,
                     *, axis: str, num_shards: int):
    """Send my block to both ring neighbors; receive theirs.

    Everyone sends clockwise with semaphore slot 0 (into the right
    neighbor's ``left_ref``) and counter-clockwise with slot 1 (into the
    left neighbor's ``right_ref``), so my ``recv_sem[0]`` is signaled by my
    left neighbor and ``recv_sem[1]`` by my right neighbor.  Both DMAs are
    started before either is waited on — the full-duplex overlap is the
    point of the kernel.
    """
    my = jax.lax.axis_index(axis)
    left = jax.lax.rem(my + num_shards - 1, num_shards)
    right = jax.lax.rem(my + 1, num_shards)

    # neighbor barrier: no shard may RDMA into a buffer whose owner has not
    # entered the kernel yet
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    cw = pltpu.make_async_remote_copy(
        src_ref=block_ref,
        dst_ref=left_ref,          # the RIGHT neighbor's left buffer
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    ccw = pltpu.make_async_remote_copy(
        src_ref=block_ref,
        dst_ref=right_ref,         # the LEFT neighbor's right buffer
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    cw.start()
    ccw.start()
    cw.wait()
    ccw.wait()


def ring_halo_exchange(block: jax.Array, *, axis: str, num_shards: int):
    """Per-shard (inside shard_map): returns (left_block, right_block) —
    the ring neighbors' ``[P_local, D]`` blocks, moved by one bi-directional
    Pallas RDMA kernel instead of two ppermute collectives."""
    return pl.pallas_call(
        partial(_exchange_kernel, axis=axis, num_shards=num_shards),
        out_shape=(
            jax.ShapeDtypeStruct(block.shape, block.dtype),
            jax.ShapeDtypeStruct(block.shape, block.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=_RING_COLLECTIVE_ID,
        ),
    )(block)


def _pack(poses, logw, lm_mean, lm_cov, lm_count):
    """[P_local, D] f32 with D = 3 + 1 + 2L + 4L + 1.  lm_count <= L is
    exactly representable in f32."""
    p = poses.shape[0]
    return jnp.concatenate([
        poses,
        logw[:, None],
        lm_mean.reshape(p, -1),
        lm_cov.reshape(p, -1),
        lm_count.astype(jnp.float32)[:, None],
    ], axis=1)


def _unpack(block, l):
    p = block.shape[0]
    poses = block[:, :3]
    logw = block[:, 3]
    lm_mean = block[:, 4: 4 + 2 * l].reshape(p, l, 2)
    lm_cov = block[:, 4 + 2 * l: 4 + 6 * l].reshape(p, l, 2, 2)
    lm_count = block[:, 4 + 6 * l].astype(jnp.int32)
    return poses, logw, lm_mean, lm_cov, lm_count


def _ring_body(poses, logw, lm_mean, lm_cov, lm_count, u0,
               *, axis: str, num_shards: int, parity: bool):
    """Same ancestor math + fallback as resample._resample_body, with the
    two ppermutes replaced by the bi-directional Pallas exchange."""
    p_local = poses.shape[0]
    l = lm_mean.shape[1]
    p_global = p_local * num_shards
    shard = jax.lax.axis_index(axis)
    my_start = shard * p_local

    w_local = jnp.exp(logw)
    w_all = jax.lax.all_gather(w_local, axis, tiled=True)       # [P]
    cum = jnp.cumsum(w_all)
    positions = u0 + (my_start + jnp.arange(p_local, dtype=cum.dtype)) / p_global
    idx = jnp.clip(
        jnp.searchsorted(cum, positions, side="left"), 0, p_global - 1
    )

    block = _pack(poses, logw, lm_mean, lm_cov, lm_count)
    left, right = ring_halo_exchange(block, axis=axis, num_shards=num_shards)
    window = jnp.concatenate([left, block, right], axis=0)      # [3*P_local, D]

    local_idx = idx - (my_start - p_local)
    my_in_window = jnp.all((local_idx >= 0) & (local_idx < 3 * p_local))
    use_halo = jax.lax.psum((~my_in_window).astype(jnp.int32), axis) == 0
    safe_local = jnp.clip(local_idx, 0, 3 * p_local - 1)

    def from_halo(_):
        return jnp.take(window, safe_local, axis=0)

    def from_full(_):
        full = jax.lax.all_gather(block, axis, tiled=True)
        return jnp.take(full, idx, axis=0)

    new_block = jax.lax.cond(use_halo, from_halo, from_full, None)
    new_poses, new_logw, new_mean, new_cov, new_count = _unpack(new_block, l)
    if not parity:
        new_logw = jnp.full((p_local,), -jnp.log(p_global), dtype=logw.dtype)
    return new_poses, new_logw, new_mean, new_cov, new_count


def ring_halo_resample(
    state: FilterState, u0: jax.Array, mesh: Mesh, config: FastSLAMConfig
) -> FilterState:
    """Drop-in for ``resample.halo_systematic_resample`` built on the Pallas
    ring kernel.  PROTOTYPE — see module docstring for validation status."""
    axis = config.particle_axis
    num_shards = mesh.shape[axis]
    pspec = P(axis)

    body = shard_map(
        partial(_ring_body, axis=axis, num_shards=num_shards,
                parity=config.parity_mode),
        mesh=mesh,
        in_specs=(P(axis, None), pspec, P(axis, None, None),
                  P(axis, None, None), pspec, P()),
        out_specs=(P(axis, None), pspec, P(axis, None, None),
                   P(axis, None, None), pspec),
        check_vma=False,
    )
    poses, logw, mean, cov, count = body(
        state.poses, state.log_weights, state.lm_mean, state.lm_cov,
        state.lm_count, u0,
    )
    return state._replace(
        poses=poses, log_weights=logw, lm_mean=mean, lm_cov=cov,
        lm_count=count,
    )
