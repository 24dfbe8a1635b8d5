"""Tests for the efficiency report (cli info / utils.model_info)."""

import pytest

from change3d_tpu.models.x3d import X3DConfig
from change3d_tpu.utils.model_info import (
    REFERENCE_EFFICIENCY,
    format_info,
    model_info,
)


def _tiny_cfg():
    return X3DConfig(
        stem_dim_out=8,
        stage_dims=(8, 16, 24, 32),
        stage_inner_dims=(18, 36, 54, 72),
        stage_depths=(2, 2, 3, 2),
        head_dim_out=64,
        num_classes=10,
    )


@pytest.mark.parametrize("task", ["bcd", "scd", "bda", "cc"])
def test_model_info_tiny(task):
    report = model_info(
        task,
        in_height=32,
        in_width=32,
        vocab_size=40,
        # CC cross-attends over the stage-4 memory: embed_dim must match
        # the tiny config's last stage dim (reference: 192 == 192).
        embed_dim=32,
        n_head=2,
        n_layer=1,
        max_caption_len=8,
        backbone_cfg=_tiny_cfg(),
    )
    bd = report["params_breakdown"]
    assert report["params_total"] == sum(bd.values())
    assert (
        report["params_excl_perception"]
        == report["params_total"] - bd["perception_frames"]
    )
    assert bd["backbone"] > 0 and bd["heads"] > 0
    # flax materializes only forward-touched params: perception frames exist,
    # and CC (which never runs enhance) has no fc convs in its tree.
    assert bd["perception_frames"] == {"bcd": 1, "scd": 3, "bda": 2, "cc": 1}[
        task
    ] * 32 * 32 * 3
    if task == "cc":
        assert bd["enhance_fc"] == 0
    else:
        assert bd["enhance_fc"] == 8 * 8 + 8 * 8 + 16 * 16 + 24 * 24
    assert report["flops_per_sample"] > 0
    assert report["macs_per_sample"] == report["flops_per_sample"] / 2
    # Tiny config at 32x32 never matches the published 256^2 table.
    assert "reference" not in report
    text = format_info(report)
    assert f"task: {task}" in text


def test_detection_tree_has_no_stage4_or_head():
    """Detection forwards stop at stage 3 — the unused stage-4/head params
    are not even materialized (the reference keeps them resident;
    ref: /root/reference/model/trainer.py:44-48)."""
    import jax
    import jax.numpy as jnp

    from change3d_tpu.models.trainer import Change3D, Task

    model = Change3D(task=Task("bcd"), in_height=32, in_width=32, backbone_cfg=_tiny_cfg())
    pre = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pre, pre)["params"]
    x3d = params["encoder"]["x3d"]
    assert "stage3" in x3d and "stage4" not in x3d and "head" not in x3d


def test_reference_table_complete():
    assert set(REFERENCE_EFFICIENCY) == {"bcd", "scd", "bda", "cc"}
    for row in REFERENCE_EFFICIENCY.values():
        assert set(row) == {"params_m", "gflops", "inference_s"}
