"""Predictor / serving-path tests on tiny models."""

import numpy as np

import jax

from change3d_tpu.inference import Predictor, CaptionPredictor
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import X3DConfig

TINY_CFG = X3DConfig(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(1, 1, 2, 1),
    head_dim_out=64,
    num_classes=10,
)

H = W = 16


def _init(model, **kwargs):
    import jax.numpy as jnp

    x = jnp.zeros((1, H, W, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x, x, **kwargs)


def test_bcd_predictor():
    model = Change3D(task=Task.BCD, in_height=H, in_width=W, backbone_cfg=TINY_CFG)
    pred = Predictor(model, _init(model))
    rng = np.random.RandomState(0)
    out = pred.predict(rng.randn(3, H, W, 3).astype(np.float32), rng.randn(3, H, W, 3).astype(np.float32))
    assert out["change"].shape == (3, H, W)
    assert out["change"].dtype == bool


def test_bcd_predictor_embed_weights_matches():
    """Serving mode (weights closed over as compile-time constants) matches
    the parameter-passing path to reordering/ulp level (XLA constant-folds
    the BN vectors, which changes fusion decisions but not the math)."""
    import jax.numpy as jnp

    model = Change3D(task=Task.BCD, in_height=H, in_width=W, backbone_cfg=TINY_CFG)
    variables = _init(model)
    rng = np.random.RandomState(1)
    a = rng.randn(2, H, W, 3).astype(np.float32)
    b = rng.randn(2, H, W, 3).astype(np.float32)
    base = Predictor(model, variables, compute_dtype=jnp.float32)
    emb = Predictor(model, variables, compute_dtype=jnp.float32, embed_weights=True)
    np.testing.assert_allclose(
        base._forward(variables, jnp.asarray(a), jnp.asarray(b))["change"],
        emb._forward(variables, jnp.asarray(a), jnp.asarray(b))["change"],
        rtol=1e-5,
        atol=1e-6,
    )
    assert emb.predict(a, b)["change"].shape == (2, H, W)


def test_predict_u8_matches_float_path():
    """The transfer-lean uint8 serving forward (on-device normalize +
    harden) must make the same decisions as host-normalize -> predict,
    for a binary and a multi-class task."""
    import jax.numpy as jnp

    from change3d_tpu.data.transforms import eval_normalize

    rng = np.random.RandomState(2)
    a8 = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    b8 = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    for task, keys in ((Task.BCD, ["change"]), (Task.SCD, ["pre", "post", "change"])):
        model = Change3D(task=task, in_height=H, in_width=W, backbone_cfg=TINY_CFG,
                         num_classes=1 if task == Task.BCD else 6)
        pred = Predictor(model, _init(model), compute_dtype=jnp.float32)
        host = pred.predict(
            np.stack([eval_normalize(x) for x in a8]),
            np.stack([eval_normalize(x) for x in b8]),
        )
        dev = pred.predict_u8(a8, b8)
        for k in keys:
            np.testing.assert_array_equal(np.asarray(dev[k]), np.asarray(host[k]), err_msg=f"{task} {k}")
    # embed_weights variant routes through the same lazy jit helper.
    model = Change3D(task=Task.BCD, in_height=H, in_width=W, backbone_cfg=TINY_CFG)
    variables = _init(model)
    base = Predictor(model, variables, compute_dtype=jnp.float32)
    emb = Predictor(model, variables, compute_dtype=jnp.float32, embed_weights=True)
    np.testing.assert_array_equal(emb.predict_u8(a8, b8)["change"], base.predict_u8(a8, b8)["change"])


def test_predict_u8_matches_float_path_bf16():
    """Same parity claim under the PRODUCTION compute dtype (bf16): the u8
    path normalizes in fp32 with eval_normalize's exact op sequence before
    casting, so the model sees bit-identical bf16 inputs either way and the
    hardened decisions must agree exactly."""
    import jax.numpy as jnp

    from change3d_tpu.data.transforms import eval_normalize

    rng = np.random.RandomState(7)
    a8 = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    b8 = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    model = Change3D(task=Task.BCD, in_height=H, in_width=W, backbone_cfg=TINY_CFG)
    pred = Predictor(model, _init(model), compute_dtype=jnp.bfloat16)
    host = pred.predict(
        np.stack([eval_normalize(x) for x in a8]),
        np.stack([eval_normalize(x) for x in b8]),
    )
    dev = pred.predict_u8(a8, b8)
    np.testing.assert_array_equal(np.asarray(dev["change"]), np.asarray(host["change"]))


def test_predict_u8_async_matches_blocking():
    """The async launch/fetch split (the pipelined batcher's path, with
    on-device bitpacked binary masks) equals the blocking predict path.
    Any valid input width is divisible by 8 (the stride-8 feature pyramid
    requires it), so the bitpack is always active; the W%8 guard in
    _make_forward_u8 is defensive only."""
    import jax.numpy as jnp

    from change3d_tpu.data.transforms import eval_normalize

    rng = np.random.RandomState(3)
    model = Change3D(task=Task.BCD, in_height=H, in_width=W,
                     backbone_cfg=TINY_CFG)
    pred = Predictor(model, _init(model), compute_dtype=jnp.float32)
    a8 = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    b8 = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    handles = pred.predict_u8_async(a8, b8)
    # The wire form really is packed: W/8 bytes per row.
    assert handles["change"].shape == (2, H, W // 8)
    via_async = pred.finalize_u8(handles)
    host = pred.predict(
        np.stack([eval_normalize(x) for x in a8]),
        np.stack([eval_normalize(x) for x in b8]),
    )
    assert via_async["change"].dtype == bool
    assert via_async["change"].shape == (2, H, W)
    np.testing.assert_array_equal(via_async["change"], host["change"])


def test_sharded_predictor_matches_single_device():
    """shard=True spreads the batch over the 8-virtual-device mesh (params
    replicated, batch sharded — the engine's GSPMD layout) with per-sample
    results identical to the single-device path."""
    import jax.numpy as jnp

    model = Change3D(task=Task.BCD, in_height=H, in_width=W, backbone_cfg=TINY_CFG)
    variables = _init(model)
    rng = np.random.RandomState(2)
    a = rng.randn(8, H, W, 3).astype(np.float32)
    b = rng.randn(8, H, W, 3).astype(np.float32)
    base = Predictor(model, variables, compute_dtype=jnp.float32)
    sharded = Predictor(model, variables, compute_dtype=jnp.float32, shard=True)
    assert len(jax.devices()) == 8  # conftest virtual mesh
    probs_b = base.predict_probs(a, b)["change"]
    probs_s = sharded.predict_probs(a, b)["change"]
    np.testing.assert_allclose(probs_s, probs_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        sharded.predict(a, b)["change"], base.predict(a, b)["change"]
    )


def test_sharded_quantized_predictor_matches():
    """shard x int8: per-sample dynamic scales are batch-shard-local by
    construction, so sharded quantized inference equals single-device."""
    import dataclasses

    import jax.numpy as jnp

    from change3d_tpu.models.x3d import X3DConfig

    quant_cfg = dataclasses.replace(
        X3DConfig(stem_dim_out=8, stage_dims=(8, 16, 24, 32),
                  stage_inner_dims=(18, 36, 54, 72), stage_depths=(1, 1, 2, 1),
                  head_dim_out=64, num_classes=10),
        quantized_eval=True,
    )
    model = Change3D(task=Task.BCD, in_height=H, in_width=W, backbone_cfg=quant_cfg)
    variables = _init(model)
    rng = np.random.RandomState(3)
    a = rng.randn(8, H, W, 3).astype(np.float32)
    b = rng.randn(8, H, W, 3).astype(np.float32)
    base = Predictor(model, variables, compute_dtype=jnp.float32)
    sharded = Predictor(model, variables, compute_dtype=jnp.float32, shard=True)
    np.testing.assert_allclose(
        sharded.predict_probs(a, b)["change"],
        base.predict_probs(a, b)["change"],
        rtol=1e-5, atol=1e-6,
    )


def test_scd_bda_predictors():
    rng = np.random.RandomState(0)
    a = rng.randn(2, H, W, 3).astype(np.float32)
    b = rng.randn(2, H, W, 3).astype(np.float32)
    scd = Change3D(task=Task.SCD, num_classes=6, in_height=H, in_width=W, backbone_cfg=TINY_CFG)
    out = Predictor(scd, _init(scd)).predict(a, b)
    assert out["pre"].shape == (2, H, W) and out["pre"].max() < 6
    assert out["change"].dtype == bool
    bda = Change3D(task=Task.BDA, num_classes=5, in_height=H, in_width=W, backbone_cfg=TINY_CFG)
    out = Predictor(bda, _init(bda)).predict(a, b)
    assert out["cls"].shape == (2, H, W) and out["loc"].dtype == bool


def test_caption_predictor():
    import jax.numpy as jnp

    wm = {"<pad>": 0, "<unk>": 1, "<start>": 2, "<end>": 3, "road": 4, "built": 5}
    model = Change3D(
        task=Task.CC, vocab_size=len(wm), embed_dim=32, num_heads=4, num_layers=1,
        in_height=H, in_width=W, backbone_cfg=TINY_CFG,
    )
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, captions=jnp.zeros((1, 4), jnp.int32))
    pred = CaptionPredictor(model, variables, wm, beam_size=2)
    rng = np.random.RandomState(0)
    captions = pred.caption(rng.randn(2, H, W, 3).astype(np.float32), rng.randn(2, H, W, 3).astype(np.float32))
    assert len(captions) == 2
    assert all(isinstance(c, str) for c in captions)
    # uint8 fast path == host ImageNet normalize -> caption.
    from change3d_tpu.data.datasets import CaptionDataset

    a8 = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    b8 = rng.randint(0, 256, (2, H, W, 3), np.uint8)
    norm = lambda x: (x.astype(np.float32) / 255.0 - CaptionDataset.MEAN) / CaptionDataset.STD
    assert pred.caption_u8(a8, b8) == pred.caption(norm(a8), norm(b8))
