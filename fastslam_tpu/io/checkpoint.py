"""Checkpoint / resume of the full filter state — greenfield vs the reference.

The reference's only persisted output is the per-tick JSON overwrite, which
holds particle *poses* only — maps and covariances are unrecoverable
(``serializer.py:36-49``, SURVEY.md §5).  Here the complete
:class:`FilterState` pytree (poses, log-weights, landmark means/covs/counts,
PRNG key) plus the app-loop state (iteration counter, dead-reckoned pose)
round-trips through a single ``.npz`` with atomic replace, so a run can
resume mid-trajectory after preemption.

For multi-host sharded state, each array is fetched with
``jax.device_get`` (gathering shards); re-sharding on load is the caller's
job via ``parallel.mesh.shard_state``.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import jax
import numpy as np

from fastslam_tpu.core.state import FilterState, PlanesState

_FORMAT_VERSION = 1

_PLANE_FIELDS = ("lm_mx", "lm_my", "lm_ca", "lm_cb", "lm_cc", "lm_cd")


def save_checkpoint(path: str, state, *, iteration: int = 0,
                    robot_pose=None, extra: Optional[dict] = None) -> None:
    """Atomically write the full filter + loop state.

    Accepts either layout: a :class:`FilterState` ([P, L, k] blocks) or a
    :class:`PlanesState` ([L, P] planes — saved natively, no conversion);
    :func:`load_checkpoint` restores whichever was saved.
    """
    key_data = jax.random.key_data(state.rng)
    arrays = {
        "format_version": np.int32(_FORMAT_VERSION),
        "poses": np.asarray(state.poses),
        "log_weights": np.asarray(state.log_weights),
        "lm_count": np.asarray(state.lm_count),
        "rng_key_data": np.asarray(key_data),
        "iteration": np.int64(iteration),
        "robot_pose": np.asarray(
            robot_pose if robot_pose is not None else np.zeros(3)
        ),
    }
    if isinstance(state, PlanesState):
        arrays["layout"] = np.asarray("planes")
        for f in _PLANE_FIELDS:
            v = getattr(state, f)
            if v is None:
                continue  # production states carry no cc plane (cc == cb)
            arrays[f] = np.asarray(v)
    else:
        arrays["lm_mean"] = np.asarray(state.lm_mean)
        arrays["lm_cov"] = np.asarray(state.lm_cov)
    if extra:
        for k, v in extra.items():
            arrays["extra_" + k] = np.asarray(v)

    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d or ".", suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise


def load_checkpoint(path: str):
    """Returns ``(state, meta)`` where meta has iteration/robot_pose/extras."""
    z = np.load(path)
    version = int(z["format_version"])
    if version != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {version}")
    import jax.numpy as jnp

    rng = jax.random.wrap_key_data(jnp.asarray(z["rng_key_data"]))
    if "layout" in z.files and str(z["layout"]) == "planes":
        state = PlanesState(
            poses=jnp.asarray(z["poses"]),
            log_weights=jnp.asarray(z["log_weights"]),
            lm_count=jnp.asarray(z["lm_count"]),
            rng=rng,
            **{f: (jnp.asarray(z[f]) if f in z.files else None)
               for f in _PLANE_FIELDS},
        )
    else:
        state = FilterState(
            poses=jnp.asarray(z["poses"]),
            log_weights=jnp.asarray(z["log_weights"]),
            lm_mean=jnp.asarray(z["lm_mean"]),
            lm_cov=jnp.asarray(z["lm_cov"]),
            lm_count=jnp.asarray(z["lm_count"]),
            rng=rng,
        )
    meta = {
        "iteration": int(z["iteration"]),
        "robot_pose": np.asarray(z["robot_pose"]),
        "extra": {
            k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
        },
    }
    return state, meta
