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
the result is validated against the single-device resampler).  The
ancestor-window and pack/unpack math is SHARED with
``resample.halo_systematic_resample`` (imported, not duplicated) and the
whole resampler minus the RDMA kernel runs at 8 shards on the virtual CPU
mesh by substituting a ppermute exchange with the identical contract
(``tests/test_distributed_resample.py::test_ring_resampler_math_at_8_shards``
— which immediately caught a pre-refactor lm_cov unpack shape bug).  The
ONLY code untested off-hardware is the ``make_async_remote_copy`` exchange
kernel itself: concurrency of the two RDMA directions and barrier
correctness across >1 devices REQUIRE real multi-chip hardware and remain
explicitly deferred; this environment exposes one chip behind a tunnel.
The production default remains ``resample.halo_systematic_resample``
(config.distributed_resample) until a pod validates this path.

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


def _ppermute_exchange(block, *, axis: str, num_shards: int):
    """XLA substitute for :func:`ring_halo_exchange` with the identical
    (left_block, right_block) contract — used to test the ENTIRE ring
    resampler (pack/window order/ancestor math/fallback) on the virtual
    CPU mesh, where Mosaic cannot lower remote DMAs.  After this
    substitution the only hardware-only code left is the
    ``make_async_remote_copy`` exchange kernel itself."""
    left = jax.lax.ppermute(
        block, axis, [((i - 1) % num_shards, i) for i in range(num_shards)]
    )
    right = jax.lax.ppermute(
        block, axis, [((i + 1) % num_shards, i) for i in range(num_shards)]
    )
    return left, right


def _ring_body(poses, logw, lm_mean, lm_cov, lm_count, u0,
               *, axis: str, num_shards: int, parity: bool,
               exchange=None):
    """Same ancestor-window math as resample._resample_body — imported from
    there, not duplicated — with the two ppermutes replaced by the
    bi-directional Pallas exchange (or the injected ``exchange`` fn)."""
    from fastslam_tpu.parallel.resample import (
        pack_particle_block, shard_ancestor_window, unpack_particle_block,
    )

    p_local = poses.shape[0]
    l = lm_mean.shape[1]
    p_global = p_local * num_shards

    idx, safe_local, use_halo = shard_ancestor_window(
        logw, u0, axis=axis, num_shards=num_shards
    )

    block = pack_particle_block(poses, logw, lm_mean, lm_cov, lm_count)
    exchange = exchange or ring_halo_exchange
    left, right = exchange(block, axis=axis, num_shards=num_shards)
    window = jnp.concatenate([left, block, right], axis=0)      # [3*P_local, D]

    def from_halo(_):
        return jnp.take(window, safe_local, axis=0)

    def from_full(_):
        full = jax.lax.all_gather(block, axis, tiled=True)
        return jnp.take(full, idx, axis=0)

    new_block = jax.lax.cond(use_halo, from_halo, from_full, None)
    new_poses, new_logw, new_mean, new_cov, new_count = unpack_particle_block(
        new_block, l
    )
    if not parity:
        new_logw = jnp.full((p_local,), -jnp.log(p_global), dtype=logw.dtype)
    return new_poses, new_logw, new_mean, new_cov, new_count


def ring_halo_resample(
    state: FilterState, u0: jax.Array, mesh: Mesh, config: FastSLAMConfig,
    *, _exchange=None,
) -> FilterState:
    """Drop-in for ``resample.halo_systematic_resample`` built on the Pallas
    ring kernel.  PROTOTYPE — see module docstring for validation status.
    ``_exchange`` (testing only) swaps the RDMA kernel for an XLA ppermute
    exchange so the rest of the path runs on the virtual CPU mesh."""
    axis = config.particle_axis
    num_shards = mesh.shape[axis]
    pspec = P(axis)

    body = shard_map(
        partial(_ring_body, axis=axis, num_shards=num_shards,
                parity=config.parity_mode, exchange=_exchange),
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
