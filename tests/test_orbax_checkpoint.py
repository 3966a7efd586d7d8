"""Orbax sharded checkpoint: save/restore directly onto a device mesh
(multi-host-capable path; exercised here on the 8-device virtual CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core.state import init_planes_state, init_state
from fastslam_tpu.io.orbax_checkpoint import (
    load_sharded_checkpoint,
    save_sharded_checkpoint,
)
from fastslam_tpu.parallel.mesh import make_mesh, shard_planes_state, shard_state

CFG = FastSLAMConfig(num_particles=128, max_landmarks=8, max_measurements=4)


def test_sharded_planes_roundtrip(tmp_path):
    mesh = make_mesh(CFG)
    st = shard_planes_state(init_planes_state(CFG, rng=3), mesh, CFG)
    # make the state non-trivial
    st = st._replace(
        poses=st.poses + 1.5,
        lm_mx=st.lm_mx.at[0].set(2.0),
        lm_count=st.lm_count + 1,
    )

    path = str(tmp_path / "ckpt")
    save_sharded_checkpoint(path, st, iteration=42, robot_pose=[1., 2., 0.3])

    template = shard_planes_state(init_planes_state(CFG, rng=0), mesh, CFG)
    got, meta = load_sharded_checkpoint(path, template)

    assert meta["iteration"] == 42
    np.testing.assert_allclose(meta["robot_pose"], [1., 2., 0.3])
    np.testing.assert_array_equal(np.asarray(got.poses), np.asarray(st.poses))
    np.testing.assert_array_equal(np.asarray(got.lm_mx), np.asarray(st.lm_mx))
    np.testing.assert_array_equal(np.asarray(got.lm_count),
                                  np.asarray(st.lm_count))
    # restored arrays carry the template's sharding (no host gather)
    assert got.lm_mx.sharding == template.lm_mx.sharding
    assert len(got.lm_mx.addressable_shards) == 8
    # RNG stream restored: next split identical
    a = jax.random.normal(jax.random.split(st.rng)[0], (4,))
    b = jax.random.normal(jax.random.split(got.rng)[0], (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocks_roundtrip_and_layout_guard(tmp_path):
    mesh = make_mesh(CFG)
    st = shard_state(init_state(CFG, rng=1), mesh, CFG)
    path = str(tmp_path / "ckpt_blocks")
    save_sharded_checkpoint(path, st, iteration=7)

    template = shard_state(init_state(CFG, rng=0), mesh, CFG)
    got, meta = load_sharded_checkpoint(path, template)
    assert meta["iteration"] == 7
    np.testing.assert_array_equal(np.asarray(got.lm_mean),
                                  np.asarray(st.lm_mean))

    # restoring a blocks checkpoint into a planes template must refuse
    ptmpl = shard_planes_state(init_planes_state(CFG, rng=0), mesh, CFG)
    with pytest.raises(Exception):
        load_sharded_checkpoint(path, ptmpl)
