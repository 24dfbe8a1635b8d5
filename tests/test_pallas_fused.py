"""Pallas fused bottleneck kernel vs the XLA op composition (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from change3d_tpu.ops.layers import depthwise_conv3d, pointwise_conv3d, swish, squeeze_excite_3d
from change3d_tpu.ops.pallas.fused_block import (
    fused_bottleneck_block,
    fused_bottleneck_block_htiled,
)


def _reference(x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se):
    xa = jax.nn.relu(pointwise_conv3d(x, w_a) * a_a + b_a)
    xd = depthwise_conv3d(xa, w_dw[..., None, :].reshape(3, 3, 3, 1, -1))
    xb = xd * a_b + b_b
    if se is not None:
        w1, b1, w2, b2 = se
        xb = squeeze_excite_3d(xb, w1, b1, w2, b2)
    xs = swish(xb)
    xc = pointwise_conv3d(xs, w_c) * a_c + b_c
    return jax.nn.relu(xc + x)


@pytest.mark.parametrize("has_se", [False, True])
def test_fused_block_matches_composition(has_se):
    rng = np.random.RandomState(0)
    b, t, h, w, c, ci, cr = 2, 3, 8, 8, 16, 36, 8
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
    x = f(b, t, h, w, c)
    w_a, a_a, b_a = f(c, ci), f(ci) * 0.1 + 1.0, f(ci) * 0.1
    w_dw = f(3, 3, 3, ci)
    a_b, b_b = f(ci) * 0.1 + 1.0, f(ci) * 0.1
    w_c, a_c, b_c = f(ci, c), f(c) * 0.1 + 1.0, f(c) * 0.1
    se = (f(ci, cr), f(cr), f(cr, ci), f(ci)) if has_se else None

    ref = _reference(x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se)
    got = fused_bottleneck_block(
        x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("has_se", [False, True])
@pytest.mark.parametrize("h_tile", [4, 8])
def test_htiled_fused_block_matches_composition(has_se, h_tile):
    rng = np.random.RandomState(1)
    b, t, h, w, c, ci, cr = 2, 3, 16, 8, 12, 20, 8
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
    x = f(b, t, h, w, c)
    w_a, a_a, b_a = f(c, ci), f(ci) * 0.1 + 1.0, f(ci) * 0.1
    w_dw = f(3, 3, 3, ci)
    a_b, b_b = f(ci) * 0.1 + 1.0, f(ci) * 0.1
    w_c, a_c, b_c = f(ci, c), f(c) * 0.1 + 1.0, f(c) * 0.1
    se = (f(ci, cr), f(cr), f(cr, ci), f(ci)) if has_se else None

    ref = _reference(x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se)
    got = fused_bottleneck_block_htiled(
        x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se,
        h_tile=h_tile, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("has_se", [False, True])
@pytest.mark.parametrize("h_tile", [4, 8])
def test_jtiled_fused_block_matches_composition(has_se, h_tile):
    """The no-manual-DMA H-tiled variant (halos via clamped BlockSpecs) —
    the form this environment's compile service accepts for stages 1/2."""
    from change3d_tpu.ops.pallas.fused_block import fused_bottleneck_block_jtiled

    rng = np.random.RandomState(2)
    b, t, h, w, c, ci, cr = 2, 3, 16, 8, 12, 20, 8
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
    x = f(b, t, h, w, c)
    w_a, a_a, b_a = f(c, ci), f(ci) * 0.1 + 1.0, f(ci) * 0.1
    w_dw = f(3, 3, 3, ci)
    a_b, b_b = f(ci) * 0.1 + 1.0, f(ci) * 0.1
    w_c, a_c, b_c = f(ci, c), f(c) * 0.1 + 1.0, f(c) * 0.1
    se = (f(ci, cr), f(cr), f(cr, ci), f(ci)) if has_se else None

    ref = _reference(x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se)
    got = fused_bottleneck_block_jtiled(
        x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se,
        h_tile=h_tile, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)
