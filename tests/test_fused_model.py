"""Full-model equivalence: fused_inference Pallas path vs standard XLA path."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from change3d_tpu.models.x3d import X3D, X3DConfig


TINY = X3DConfig(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(2, 3, 3, 2),
    head_dim_out=64,
    num_classes=10,
)


def test_fused_inference_matches_standard():
    cfg = TINY
    cfg_fused = dataclasses.replace(cfg, fused_inference=True)
    model = X3D(cfg)
    model_fused = X3D(cfg_fused)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # Same parameter tree either way.
    vf = model_fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(variables)

    ref = model.apply(variables, x)
    got = model_fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-3, atol=3e-4)


def test_packed_eval_stages_match_standard():
    cfg = TINY
    cfg_packed = dataclasses.replace(cfg, packed_eval_stages=(0, 1))
    model = X3D(cfg)
    model_packed = X3D(cfg_packed)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    vp = model_packed.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(variables)
    ref = model.apply(variables, x)
    got = model_packed.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-3, atol=3e-4)


def test_packed_stem_matches_standard():
    cfg_packed = dataclasses.replace(TINY, packed_eval_stages=(-1, 0))
    model = X3D(TINY)
    model_packed = X3D(cfg_packed)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 3, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)
    got = model_packed.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-3, atol=3e-4)


def test_packed_training_path_unchanged():
    # packed_eval_stages must not affect training-mode math or variables.
    cfg_packed = dataclasses.replace(TINY, packed_eval_stages=(0,))
    model = X3D(TINY)
    model_packed = X3D(cfg_packed)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 3, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref, upd_ref = model.apply(variables, x, train=True, mutable=["batch_stats"])
    got, upd = model_packed.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_packed_train_matches_standard():
    # packed_train: forward outputs, gradients, and BN running-stat updates
    # must all match the standard path (stem included: packed-aware BN batch
    # statistics make the stem trainable packed too).
    cfg_packed = dataclasses.replace(TINY, packed_eval_stages=(-1, 0, 1), packed_train=True)
    model = X3D(TINY)
    model_packed = X3D(cfg_packed)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 3, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params, mdl):
        out, upd = mdl.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2), upd["batch_stats"]

    (ref_l, ref_stats), ref_g = jax.value_and_grad(loss, has_aux=True)(variables["params"], model)
    (got_l, got_stats), got_g = jax.value_and_grad(loss, has_aux=True)(variables["params"], model_packed)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)
    # fp32 reduction order differs between layouts (the packed depthwise does
    # T^2/T the MACs in a different order); individual near-zero gradient
    # entries wander, so compare per-leaf relative L2 error. Forward outputs
    # and BN statistics (tight tolerances) carry the correctness weight.
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_g), jax.tree_util.tree_leaves_with_path(ref_g)
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel < 1e-2, (jax.tree_util.keystr(pa), rel)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_stats), jax.tree_util.tree_leaves_with_path(ref_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_packed_eval_matches_standard_t4_t5():
    # SCD clips are T=5 and BDA clips are T=4; the packed path must be exact
    # for any clip length (round-1 hardcoded T=3 and crashed mid-trace).
    for t, seed in ((4, 5), (5, 6)):
        cfg_packed = dataclasses.replace(TINY, packed_eval_stages=(-1, 0, 1))
        model = X3D(TINY)
        model_packed = X3D(cfg_packed)
        x = jnp.asarray(np.random.RandomState(seed).randn(2, t, 16, 16, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        ref = model.apply(variables, x)
        got = model_packed.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-3, atol=3e-4)


def test_packed_train_matches_standard_t4():
    # BDA-style T=4 clip through packed_train: loss and BN stats must match.
    cfg_packed = dataclasses.replace(TINY, packed_eval_stages=(0,), packed_train=True)
    model = X3D(TINY)
    model_packed = X3D(cfg_packed)
    x = jnp.asarray(np.random.RandomState(7).randn(2, 4, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref, ref_stats = model.apply(variables, x, train=True, mutable=["batch_stats"])
    got, got_stats = model_packed.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-3, atol=3e-4)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_stats["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(ref_stats["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_packed_span_through_encoder_matches_standard():
    # Packing carried across stem -> enhance -> stages (no interior
    # pack/unpack): full Change3D outputs must match the unpacked model for
    # every task topology (BCD T=3, BDA T=4, SCD T=5).
    from change3d_tpu.models.trainer import Change3D, Task

    cfg_packed = dataclasses.replace(TINY, packed_eval_stages=(-1, 0, 1, 2, 3))
    for task, seed in ((Task.BCD, 0), (Task.BDA, 1), (Task.SCD, 2)):
        kw = dict(task=task, num_classes=4, in_height=16, in_width=16)
        model = Change3D(backbone_cfg=TINY, **kw)
        model_packed = Change3D(backbone_cfg=cfg_packed, **kw)
        rs = np.random.RandomState(seed)
        pre = jnp.asarray(rs.randn(2, 16, 16, 3), jnp.float32)
        post = jnp.asarray(rs.randn(2, 16, 16, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), pre, post)
        ref = model.apply(variables, pre, post, train=False)
        got = model_packed.apply(variables, pre, post, train=False)
        for key in ref:
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(ref[key]), rtol=3e-3, atol=3e-4,
                err_msg=f"{task}:{key}",
            )


def test_packed_span_cc_output_final():
    # CC path: blocks 0..4 without enhancement, stage-4 tap read as a packed
    # lane slice.
    from change3d_tpu.models.trainer import Change3D, Task

    cfg_packed = dataclasses.replace(TINY, packed_eval_stages=(-1, 0, 1, 2, 3))
    kw = dict(task=Task.CC, vocab_size=11, embed_dim=16, num_heads=2,
              num_layers=1, in_height=16, in_width=16)
    model = Change3D(backbone_cfg=TINY, **kw)
    model_packed = Change3D(backbone_cfg=cfg_packed, **kw)
    rs = np.random.RandomState(3)
    pre = jnp.asarray(rs.randn(2, 16, 16, 3), jnp.float32)
    post = jnp.asarray(rs.randn(2, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pre, post)
    ref = model.apply(variables, pre, post, train=False)["memory"]
    got = model_packed.apply(variables, pre, post, train=False)["memory"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-3, atol=3e-4)


def test_fused_inference_skips_when_too_large():
    # Inner tensor above the VMEM budget must fall back to the XLA path and
    # still produce identical results.
    cfg_fused = dataclasses.replace(TINY, fused_inference=True)
    model = X3D(cfg_fused)
    x = jnp.zeros((1, 3, 128, 128, 3), jnp.float32)  # stage1 inner too big to fuse
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert np.all(np.isfinite(np.asarray(out)))
