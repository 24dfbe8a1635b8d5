"""Dynamic int8 quantization (ops/quant.py) and its model integration.

The reference has no quantized inference (stock fp32 torch ops,
ref: /root/reference/model/x3d.py:109-232); this is the serving-oriented
int8 path behind X3DConfig(quantized_eval) / cli --quantized.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import X3DConfig
from change3d_tpu.ops.layers import pointwise_conv3d
from change3d_tpu.ops.packed import conv2d_packed
from change3d_tpu.ops.quant import (
    conv2d_int8,
    pointwise_conv3d_int8,
    quantize_act,
    quantize_weight,
)

TINY_CFG = X3DConfig(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(1, 1, 2, 1),
    head_dim_out=64,
    num_classes=10,
)


# ---------------------------------------------------------------------------
# op-level
# ---------------------------------------------------------------------------

def test_quantize_weight_roundtrip_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * rng.rand(32))
    q, scale = quantize_weight(w, channel_axis=3)
    assert q.dtype == jnp.int8 and scale.shape == (1, 1, 1, 32)
    deq = q.astype(jnp.float32) * scale
    # Symmetric round-to-nearest: error <= scale/2 everywhere, per channel.
    assert (jnp.abs(deq - w) <= scale / 2 + 1e-7).all()
    # Scales track each channel's own max, not the global one.
    per_ch_max = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    np.testing.assert_allclose(scale[0, 0, 0], per_ch_max / 127.0, rtol=1e-6)


def test_quantize_act_per_sample():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 5, 6, 7, 8).astype(np.float32)
    x[2] *= 100.0  # one huge sample must not wreck its neighbors' resolution
    q, scale = quantize_act(jnp.asarray(x))
    assert q.dtype == jnp.int8 and scale.shape == (4, 1, 1, 1, 1)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    for b in range(4):
        np.testing.assert_allclose(
            deq[b], x[b], atol=np.asarray(scale)[b].item() / 2 + 1e-7
        )
    # Zero tensors are safe (no division by zero, exact zeros back).
    q0, s0 = quantize_act(jnp.zeros((2, 3, 3, 4)))
    assert (np.asarray(q0) == 0).all() and np.isfinite(np.asarray(s0)).all()


def _rel_err(got, ref):
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    denom = np.abs(ref).max() + 1e-9
    return np.abs(got - ref).max() / denom, np.abs(got - ref).mean() / denom


def test_pointwise_int8_matches_fp32():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3, 8, 8, 24).astype(np.float32))
    w = jnp.asarray(rng.randn(24, 48).astype(np.float32) * rng.rand(48))
    ref = pointwise_conv3d(x, w)
    got = pointwise_conv3d_int8(x, w)
    assert got.dtype == x.dtype and got.shape == ref.shape
    mx, mean = _rel_err(got, ref)
    assert mx < 0.05 and mean < 0.01, (mx, mean)


def test_conv2d_int8_matches_fp32():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 24, 24).astype(np.float32))
    for stride, padding in ((1, 1), (2, 1)):
        ref = conv2d_packed(x, w, stride=stride, padding=padding)
        got = conv2d_int8(x, w, stride=stride, padding=padding)
        assert got.shape == ref.shape
        mx, mean = _rel_err(got, ref)
        assert mx < 0.05 and mean < 0.01, (stride, mx, mean)


def test_int8_ops_preserve_bf16_dtype():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 2, 4, 4, 8), jnp.bfloat16)
    w = jnp.asarray(rng.randn(8, 16), jnp.float32)
    assert pointwise_conv3d_int8(x, w).dtype == jnp.bfloat16


# ---------------------------------------------------------------------------
# model-level
# ---------------------------------------------------------------------------

def _bcd_forward(backbone_cfg, variables, pre, post):
    model = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                     backbone_cfg=backbone_cfg)
    out = model.apply(variables, pre, post, train=False)["change"]
    return jax.nn.sigmoid(np.asarray(out.astype(jnp.float32)))


@pytest.mark.parametrize("packed", [(), (0,)], ids=["standard", "packed"])
def test_quantized_model_agrees_with_fp32(packed):
    """Same variables, quantized_eval on/off: probability maps stay close and
    confident decisions agree (the parameter tree is untouched — quantization
    happens at trace time)."""
    base = dataclasses.replace(TINY_CFG, packed_eval_stages=packed)
    quant = dataclasses.replace(base, quantized_eval=True)
    model = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                     backbone_cfg=base)
    rng = np.random.RandomState(5)
    pre = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    post = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pre, post)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    p_fp32 = _bcd_forward(base, variables, pre, post)
    p_int8 = _bcd_forward(quant, variables, pre, post)

    assert np.abs(p_int8 - p_fp32).max() < 0.1
    confident = np.abs(p_fp32 - 0.5) > 0.05
    agree = (p_int8 > 0.5) == (p_fp32 > 0.5)
    assert agree[confident].mean() > 0.995


def test_quantized_param_tree_identical():
    """quantized_eval must not change the variable tree (same checkpoints)."""
    base = TINY_CFG
    quant = dataclasses.replace(TINY_CFG, quantized_eval=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v_base = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                      backbone_cfg=base).init(jax.random.PRNGKey(0), x, x)
    v_quant = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                       backbone_cfg=quant).init(jax.random.PRNGKey(0), x, x)
    base_shapes = jax.tree.map(lambda a: a.shape, v_base)
    quant_shapes = jax.tree.map(lambda a: a.shape, v_quant)
    assert base_shapes == quant_shapes
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_base["params"], v_quant["params"],
    )


def test_quantized_embed_weights_matches():
    """The production serving combo — quantized_eval + embed_weights (weight
    int8 scales constant-fold at compile time) — matches the
    parameter-passing quantized path exactly."""
    from change3d_tpu.inference import Predictor

    quant = dataclasses.replace(TINY_CFG, quantized_eval=True)
    model = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                     backbone_cfg=quant)
    rng = np.random.RandomState(9)
    pre = rng.randn(2, 32, 32, 3).astype(np.float32)
    post = rng.randn(2, 32, 32, 3).astype(np.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    base = Predictor(model, variables, compute_dtype=jnp.float32)
    emb = Predictor(model, variables, compute_dtype=jnp.float32,
                    embed_weights=True)
    np.testing.assert_allclose(
        emb.predict_probs(pre, post)["change"],
        base.predict_probs(pre, post)["change"],
        rtol=1e-5, atol=1e-6,
    )


def test_quantized_under_scanned_pairs():
    """X3D-L runs its stage interiors as nn.scan'd block PAIRS with stacked
    params; quantization must work inside the scan body too (weight scales
    computed per scan step from the stacked slice)."""
    deep = dataclasses.replace(TINY_CFG, stage_depths=(1, 3, 1, 1))  # n_pairs=1
    assert deep.scan_blocks
    quant = dataclasses.replace(deep, quantized_eval=True)
    model = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                     backbone_cfg=deep)
    rng = np.random.RandomState(8)
    pre = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    post = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pre, post)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    p_fp32 = _bcd_forward(deep, variables, pre, post)
    p_int8 = _bcd_forward(quant, variables, pre, post)
    assert np.abs(p_int8 - p_fp32).max() < 0.1
    confident = np.abs(p_fp32 - 0.5) > 0.05
    assert ((p_int8 > 0.5) == (p_fp32 > 0.5))[confident].mean() > 0.995


def test_quantized_caption_encoder_decodes():
    """The CC encoder honors quantized_eval too (cc serve --quantized):
    beam decode over the int8 backbone returns well-formed sentences."""
    from change3d_tpu.inference import CaptionPredictor

    vocab = {"<pad>": 0, "<unk>": 1, "<start>": 2, "<end>": 3, "a": 4, "b": 5}
    quant = dataclasses.replace(TINY_CFG, quantized_eval=True)
    model = Change3D(task=Task.CC, vocab_size=len(vocab), embed_dim=32,
                     num_heads=4, num_layers=1, backbone_cfg=quant,
                     in_height=32, in_width=32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x,
                           captions=jnp.zeros((1, 4), jnp.int32))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    p = CaptionPredictor(model, variables, vocab, beam_size=2,
                         compute_dtype=jnp.float32)
    rng = np.random.RandomState(7)
    caps = p.caption(rng.randn(2, 32, 32, 3).astype(np.float32),
                     rng.randn(2, 32, 32, 3).astype(np.float32))
    assert len(caps) == 2
    assert all(w in ("a", "b", "<unk>") for c in caps for w in c.split())


def test_static_ops_match_dynamic_when_scale_is_true_max():
    """With amax = the tensor's true per-batch max, the static op and the
    dynamic op agree for a single-sample batch (same scale by definition)."""
    from change3d_tpu.ops.quant import batch_amax, pointwise_conv3d_int8_static

    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(16, 24).astype(np.float32))
    got = pointwise_conv3d_int8_static(x, w, batch_amax(x))
    ref = pointwise_conv3d_int8(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("packed", [(), (0,)], ids=["standard", "packed"])
def test_calibrate_then_static_agrees_with_fp32(packed):
    """calibrate -> static workflow: scales recorded by the fp32 calibration
    pass make the static-int8 forward agree with fp32 like dynamic does;
    Predictor refuses static without scales."""
    from change3d_tpu.inference import Predictor, calibrate_quant_scales

    base = dataclasses.replace(TINY_CFG, packed_eval_stages=packed)
    static = dataclasses.replace(base, quantized_eval=True, quant_mode="static")
    model = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                     backbone_cfg=static)
    rng = np.random.RandomState(11)
    pre = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    post = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    plain = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                     backbone_cfg=base)
    variables = plain.init(jax.random.PRNGKey(0), pre, post)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    with pytest.raises(ValueError, match="calibrate_quant_scales"):
        Predictor(model, variables, compute_dtype=jnp.float32)

    scales = calibrate_quant_scales(model, variables, [(pre, post)])
    flat = jax.tree.leaves(scales)
    assert flat and all(np.asarray(v) > 0 for v in flat)

    p_fp32 = _bcd_forward(base, variables, pre, post)
    p_static = jax.nn.sigmoid(np.asarray(model.apply(
        {**variables, "quant": scales}, pre, post, train=False
    )["change"].astype(jnp.float32)))
    assert np.abs(p_static - p_fp32).max() < 0.1
    confident = np.abs(p_fp32 - 0.5) > 0.05
    assert ((p_static > 0.5) == (p_fp32 > 0.5))[confident].mean() > 0.995

    # Calibration itself must not perturb the fp32 math.
    calib_cfg = dataclasses.replace(static, quant_mode="calibrate")
    calib = Change3D(task=Task.BCD, num_classes=1, in_height=32, in_width=32,
                     backbone_cfg=calib_cfg)
    out, _ = calib.apply(variables, pre, post, train=False, mutable=["quant"])
    np.testing.assert_array_equal(
        jax.nn.sigmoid(np.asarray(out["change"].astype(jnp.float32))), p_fp32
    )


def test_quantized_ignored_at_train_time():
    """train=True must take the exact fp32 path even with quantized_eval on
    (training numerics are reference-pinned)."""
    base = TINY_CFG
    quant = dataclasses.replace(TINY_CFG, quantized_eval=True)
    rng = np.random.RandomState(6)
    pre = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    post = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))

    def train_out(cfg):
        model = Change3D(task=Task.BCD, num_classes=1, in_height=32,
                         in_width=32, backbone_cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), pre, post)
        out, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            pre, post, train=True, mutable=["batch_stats"],
        )
        return np.asarray(out["change"].astype(jnp.float32))

    np.testing.assert_array_equal(train_out(base), train_out(quant))
