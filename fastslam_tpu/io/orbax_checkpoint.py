"""Orbax-backed sharded checkpointing for multi-host runs.

The ``.npz`` checkpoint (:mod:`fastslam_tpu.io.checkpoint`) fetches every
array with ``jax.device_get`` — on a multi-host mesh that requires gathering
non-addressable shards to one process, which does not scale past a single
host (and at 100k+ particles the landmark planes are the bulk of the state).
Orbax writes each host's shards in parallel into one logical checkpoint
(OCDBT) and restores arrays directly onto the target mesh with the requested
shardings — no host ever materializes the global state.

Greenfield vs the reference (SURVEY.md §5: the reference persists only a
per-tick JSON pose dump, ``serializer.py:36-49``; state is unrecoverable).

Usage::

    save_sharded_checkpoint(dir, state, iteration=t, robot_pose=robot)
    state, meta = load_sharded_checkpoint(dir, template=sharded_init_state)

where ``template`` is any state pytree with the desired shapes + shardings
(e.g. ``shard_planes_state(init_planes_state(cfg), mesh, cfg)``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastslam_tpu.core.state import FilterState, PlanesState

_FORMAT_VERSION = 1


def _to_payload(state, iteration: int, robot_pose) -> dict:
    """State pytree -> a flat dict payload orbax can serialize.

    The typed PRNG key becomes raw ``key_data`` (extended dtypes do not
    serialize); layout/type ride as plain metadata leaves.
    """
    # skip None fields (production planes states carry no cc plane)
    d = {f: getattr(state, f) for f in state._fields
         if f != "rng" and getattr(state, f) is not None}
    d["rng_key_data"] = jax.random.key_data(state.rng)
    # plain python ints: StandardCheckpointer rejects numpy scalar leaves
    d["format_version"] = int(_FORMAT_VERSION)
    d["layout"] = int(1 if isinstance(state, PlanesState) else 0)
    d["iteration"] = int(iteration)
    d["robot_pose"] = np.asarray(
        robot_pose if robot_pose is not None else np.zeros(3)
    )
    return d


def save_sharded_checkpoint(path: str, state, *, iteration: int = 0,
                            robot_pose=None, force: bool = True) -> None:
    """Write the full filter + loop state as an Orbax checkpoint directory.

    Works for replicated, single-host-sharded, and multi-host-sharded state:
    every process must call this collectively (Orbax coordinates via
    ``jax.distributed``); each writes only its addressable shards.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_payload(state, iteration, robot_pose),
                   force=force)


def load_sharded_checkpoint(path: str, template) -> Tuple[object, dict]:
    """Restore ``(state, meta)`` with arrays placed per ``template``.

    ``template`` is a :class:`FilterState` or :class:`PlanesState` whose
    arrays carry the TARGET shapes and shardings (a freshly-initialized
    sharded state is the natural template); restored arrays land directly on
    the template's mesh — no host-side global materialization.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if isinstance(x, jax.Array) else x,
        _to_payload(template, 0, None),
    )
    with ocp.StandardCheckpointer() as ckptr:
        got = ckptr.restore(path, abstract)

    version = int(got["format_version"])
    if version != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {version}")
    want_planes = isinstance(template, PlanesState)
    if bool(got["layout"]) != want_planes:
        raise ValueError(
            "checkpoint layout does not match the template layout "
            f"(saved {'planes' if got['layout'] else 'blocks'}, template "
            f"{'planes' if want_planes else 'blocks'})"
        )

    rng = jax.random.wrap_key_data(jnp.asarray(got["rng_key_data"]))
    cls = PlanesState if want_planes else FilterState
    state = cls(rng=rng, **{
        f: got.get(f) for f in cls._fields if f != "rng"
    })
    meta = {
        "iteration": int(got["iteration"]),
        "robot_pose": np.asarray(got["robot_pose"]),
    }
    return state, meta
