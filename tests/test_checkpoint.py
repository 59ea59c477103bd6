"""Checkpoint/resume round-trips (pickle + orbax backends)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.models.gaussians import create_from_pcd
from gaussian_splatting_tpu.train.loop import load_checkpoint, save_checkpoint
from gaussian_splatting_tpu.train.step import init_train_state


@pytest.fixture
def state(rng):
    pts = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    model = create_from_pcd(pts, cols, max_sh_degree=2, spatial_lr_scale=1.5, capacity=64)
    st = init_train_state(model, num_images=3)
    # make it non-trivial
    return dataclasses.replace(st, step=jnp.asarray(123, jnp.int32))


def _assert_state_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pickle_roundtrip(tmp_path, state):
    p = str(tmp_path / "chkpnt123.pkl")
    save_checkpoint(p, state, 123)
    restored, it = load_checkpoint(p)
    assert it == 123
    assert restored.model.capacity == state.model.capacity
    _assert_state_equal(restored, state)


def test_orbax_roundtrip(tmp_path, state):
    pytest.importorskip("orbax.checkpoint")
    p = str(tmp_path / "ckpt123")
    save_checkpoint(p, state, 123)
    restored, it = load_checkpoint(p)
    assert it == 123
    assert restored.model.capacity == state.model.capacity
    assert restored.model.spatial_lr_scale == state.model.spatial_lr_scale
    _assert_state_equal(restored, state)
