"""Tiled full-scene inference: tiling math + TiledPredictor + predict CLI.

The model's perception frames fix its input size
(ref: /root/reference/model/trainer.py:51-54), so scenes larger than the
training patch must be windowed; the reference leaves that to the user.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from change3d_tpu.inference import Predictor, TiledPredictor
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import X3DConfig
from change3d_tpu.utils.tiling import blend_window, tile_scene, untile_scene, window_starts

TINY_CFG = X3DConfig(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(1, 1, 2, 1),
    head_dim_out=64,
    num_classes=10,
)
TILE = 32


def test_blend_window_properties():
    w = blend_window(32, 32, overlap=8)
    assert w.shape == (32, 32)
    assert (w > 0).all()  # single-cover pixels must reconstruct exactly
    assert w[16, 16] == 1.0  # interior untouched
    assert w[0, 16] < w[4, 16] < w[8, 16]  # monotone ramp into the edge
    np.testing.assert_array_equal(blend_window(32, 32, 0), np.ones((32, 32)))


def test_tile_untile_identity_any_overlap():
    """Blending the tiles of a scene reconstructs the scene exactly —
    overlapping windows of the *same* map average to itself."""
    rng = np.random.RandomState(0)
    scene = rng.rand(70, 96, 3).astype(np.float32)
    for overlap in (0, 8, 15):
        tiles, offsets = tile_scene(scene, TILE, TILE, overlap)
        rec = untile_scene(tiles, offsets, 70, 96, overlap)
        np.testing.assert_allclose(rec, scene, rtol=1e-5, atol=1e-6)


def test_tile_scene_pads_small_scene():
    scene = np.ones((20, 40, 3), np.float32)
    tiles, offsets = tile_scene(scene, TILE, TILE, 0)
    assert tiles.shape[1:3] == (TILE, TILE)
    assert offsets[0] == (0, 0)
    rec = untile_scene(tiles, offsets, 20, 40, 0)
    assert rec.shape == (20, 40, 3)


@pytest.fixture(scope="module")
def bcd_predictor():
    model = Change3D(task=Task.BCD, num_classes=1, in_height=TILE, in_width=TILE,
                     backbone_cfg=TINY_CFG)
    x = jnp.zeros((1, TILE, TILE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x)
    variables = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}
    return Predictor(model, variables, compute_dtype=jnp.float32)


def test_tiled_zero_overlap_equals_per_tile_stitch(bcd_predictor):
    """With overlap=0 the scene result must be exactly the per-tile
    predictions placed side by side (weights are uniform, no blending)."""
    rng = np.random.RandomState(1)
    scene_pre = rng.randn(64, 96, 3).astype(np.float32)
    scene_post = rng.randn(64, 96, 3).astype(np.float32)

    tiled = TiledPredictor(bcd_predictor, overlap=0, batch_size=4)
    got = tiled.predict_scene(scene_pre, scene_post)["change"]
    assert got.shape == (64, 96)

    expect = np.zeros((64, 96), bool)
    for y in (0, 32):
        for x in (0, 32, 64):
            out = bcd_predictor.predict(
                scene_pre[None, y : y + 32, x : x + 32],
                scene_post[None, y : y + 32, x : x + 32],
            )
            expect[y : y + 32, x : x + 32] = out["change"][0]
    np.testing.assert_array_equal(got, expect)


def test_tiled_overlap_blends_and_batches(bcd_predictor):
    """Overlapped tiling on a non-multiple scene size: correct output shape,
    interior (single-cover-free) pixels remain valid probabilities, and the
    batch padding path (#tiles % batch != 0) is exercised."""
    rng = np.random.RandomState(2)
    scene_pre = rng.randn(70, 90, 3).astype(np.float32)
    scene_post = rng.randn(70, 90, 3).astype(np.float32)
    tiled = TiledPredictor(bcd_predictor, overlap=8, batch_size=4)
    probs = tiled.predict_scene_probs(scene_pre, scene_post)["change"]
    assert probs.shape == (70, 90, 1)
    assert np.isfinite(probs).all()
    assert (probs >= 0).all() and (probs <= 1).all()

    # Determinism / batch-size independence of the blended result.
    probs2 = TiledPredictor(bcd_predictor, overlap=8, batch_size=7).predict_scene_probs(
        scene_pre, scene_post
    )["change"]
    np.testing.assert_allclose(probs2, probs, rtol=1e-5, atol=1e-6)


def test_overlap_validation(bcd_predictor):
    with pytest.raises(ValueError):
        TiledPredictor(bcd_predictor, overlap=TILE)
    with pytest.raises(ValueError):
        TiledPredictor(bcd_predictor, overlap=-1)


def test_harden_matches_predict(bcd_predictor):
    rng = np.random.RandomState(3)
    pre = rng.randn(2, TILE, TILE, 3).astype(np.float32)
    post = rng.randn(2, TILE, TILE, 3).astype(np.float32)
    probs = bcd_predictor.predict_probs(pre, post)
    np.testing.assert_array_equal(
        Predictor.harden(probs)["change"], bcd_predictor.predict(pre, post)["change"]
    )
