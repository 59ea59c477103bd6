"""Streaming MXU segment-reduce kernel vs a numpy reference.

``segment_reduce_rows`` replaces the segmented-cumsum + segment-end-gather
pair in the rasterizer VJP (the atomicAdd-free analogue of the per-Gaussian
gradient accumulation in backward.cu:592-609): expansion-order gradient rows
reduce to per-Gaussian field-major sums.  Its correctness contract:

- g_exp is dense and monotone (every Gaussian owns >= 1 slot; sentinel
  slots carry the owning Gaussian, terminator slots carry g == P).
- Gaussians whose slots hold exact zeros get EXACT zero sums (Adam turns
  gradient dust into full-size steps).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.ops.segreduce import segment_reduce_rows


def _make_stream(rng, P, n_slots):
    """Dense monotone slot->Gaussian map: every g in [0,P) owns >= 1 slot,
    remaining tail slots belong to the terminator g == P."""
    counts = rng.integers(1, 6, size=P)
    while counts.sum() > n_slots - 1:
        counts[rng.integers(0, P)] = 1
    g = np.repeat(np.arange(P), counts)
    g = np.concatenate([g, np.full(n_slots - g.size, P)])
    return g.astype(np.int32)


def _ref_sums(vals, g, P):
    out = np.zeros((vals.shape[0], P), vals.dtype)
    np.add.at(out.T, g[g < P], vals.T[g < P])
    return out


@pytest.mark.parametrize("P,n_slots", [(100, 512), (777, 2048), (1000, 1024)])
def test_segment_reduce_matches_reference(rng, P, n_slots):
    g = _make_stream(rng, P, n_slots)
    vals = rng.normal(size=(16, n_slots)).astype(np.float32)
    out = np.asarray(
        segment_reduce_rows(jnp.asarray(vals), jnp.asarray(g), P, interpret=True)
    )
    np.testing.assert_allclose(
        out[:, :P], _ref_sums(vals, g, P), rtol=0, atol=1e-5
    )


def test_zero_slots_reduce_to_exact_zero(rng):
    """Gaussians whose every slot is 0.0 must sum to bit-zero."""
    P, n_slots = 300, 1024
    g = _make_stream(rng, P, n_slots)
    vals = rng.normal(size=(16, n_slots)).astype(np.float32)
    dead = np.isin(g, np.arange(50, 150))
    vals[:, dead] = 0.0
    out = np.asarray(
        segment_reduce_rows(jnp.asarray(vals), jnp.asarray(g), P, interpret=True)
    )
    assert np.abs(out[:, 50:150]).max() == 0.0
    np.testing.assert_allclose(out[:, :P], _ref_sums(vals, g, P), atol=1e-5)


def test_terminator_tail_ignored(rng):
    """Slots owned by the terminator (g == P) must not pollute real rows,
    even when they carry garbage values (uninitialized-HBM discipline is the
    caller's job, but the terminator window must stay out of [0, P))."""
    P, n_slots = 200, 768
    g = _make_stream(rng, P, n_slots)
    vals = rng.normal(size=(16, n_slots)).astype(np.float32)
    vals[:, g == P] = 1e30
    out = np.asarray(
        segment_reduce_rows(jnp.asarray(vals), jnp.asarray(g), P, interpret=True)
    )
    np.testing.assert_allclose(out[:, :P], _ref_sums(vals, g, P), atol=1e-5)


def test_single_gaussian_spanning_many_chunks(rng):
    """One giant segment crossing many chunk boundaries accumulates fully."""
    P, n_slots = 3, 2048
    g = np.full(n_slots, 1, np.int32)
    g[0] = 0
    g[-5:] = 2
    vals = np.ones((16, n_slots), np.float32)
    out = np.asarray(
        segment_reduce_rows(jnp.asarray(vals), jnp.asarray(g), P, interpret=True)
    )
    np.testing.assert_allclose(out[:, 0], 1.0)
    np.testing.assert_allclose(out[:, 1], float(n_slots - 6))
    np.testing.assert_allclose(out[:, 2], 5.0)
