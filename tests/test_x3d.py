"""X3D backbone: config derivation, converter completeness, torch-oracle parity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import dataclasses

from change3d_tpu.models.x3d import X3D, X3DConfig, x3d_l_config, round_width, round_repeats
from change3d_tpu.checkpoint.convert import (
    convert_x3d_state_dict,
    pack_scanned_stages,
    x3d_torch_key_map,
)

from torch_oracle import make_random_x3d_state_dict, oracle_run_blocks, oracle_head


def test_x3d_l_config_matches_reference_instantiation():
    cfg = x3d_l_config()
    # SURVEY.md §2.1 / ref: /root/reference/model/x3d.py:672-709 with
    # width_factor=2.0, depth_factor=5.0, bottleneck_factor=2.25.
    assert cfg.stem_dim_out == 24
    assert cfg.stage_dims == (24, 48, 96, 192)
    assert cfg.stage_inner_dims == (54, 108, 216, 432)
    assert cfg.stage_depths == (5, 10, 25, 15)
    assert [cfg.se_reduced_dim(i) for i in range(4)] == [8, 8, 16, 32]


def test_round_width_repeats():
    assert round_width(12, 2.0) == 24
    assert round_width(24, 2.0, divisor=8) == 48
    assert round_width(54, 0.0625) == 8
    assert round_width(432, 0.0625) == 32  # 27 -> 24 < 0.9*27 -> +8
    assert round_repeats(5, 5.0) == 25


def _tiny_cfg():
    return X3DConfig(
        stem_dim_out=8,
        stage_dims=(8, 16, 24, 32),
        stage_inner_dims=(18, 36, 54, 72),
        stage_depths=(2, 2, 3, 2),
        head_dim_out=64,
        num_classes=10,
    )


@pytest.mark.parametrize(
    "cfg_name,scan",
    [("tiny", False), ("tiny", True), ("full", True)],  # full/unroll adds only runtime
)
def test_converter_covers_all_keys(cfg_name, scan):
    cfg = _tiny_cfg() if cfg_name == "tiny" else x3d_l_config()
    cfg = dataclasses.replace(cfg, scan_blocks=scan)
    sd = make_random_x3d_state_dict(cfg, seed=1)
    key_map = x3d_torch_key_map(cfg)
    assert set(sd.keys()) == set(key_map.keys())
    variables = convert_x3d_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)
    if scan:
        variables = {
            "params": pack_scanned_stages(variables["params"], cfg),
            "batch_stats": pack_scanned_stages(variables["batch_stats"], cfg),
        }
    # Converted tree must slot exactly into a freshly initialized model.
    model = X3D(cfg)
    x = jnp.zeros((1, 3, 16, 16, 3), jnp.float32)
    init_vars = model.init(jax.random.PRNGKey(0), x, classify=True)
    got_p = jax.tree_util.tree_structure(variables["params"])
    want_p = jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda x: x, init_vars["params"]))
    assert got_p == want_p
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables["params"]),
        jax.tree_util.tree_leaves_with_path(init_vars["params"]),
    ):
        assert a.shape == b.shape, f"{pa}: {a.shape} vs {b.shape}"
    assert jax.tree_util.tree_structure(variables["batch_stats"]) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: x, init_vars["batch_stats"])
    )


@pytest.mark.parametrize("scan", [False, True])
def test_x3d_forward_matches_torch_oracle_tiny(scan):
    cfg = dataclasses.replace(_tiny_cfg(), scan_blocks=scan)
    sd = make_random_x3d_state_dict(cfg, seed=2)
    variables = convert_x3d_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)
    if scan:
        variables = {
            "params": pack_scanned_stages(variables["params"], cfg),
            "batch_stats": pack_scanned_stages(variables["batch_stats"], cfg),
        }
    model = X3D(cfg)
    x = np.random.RandomState(3).randn(2, 3, 16, 16, 3).astype(np.float32)

    outs_ref = oracle_run_blocks(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), sd, cfg)

    def run(variables, x):
        def f(mdl, x):
            outs = []
            for i in range(5):
                x = mdl.run_block(i, x, train=False)
                outs.append(x)
            return outs

        return model.apply(variables, jnp.asarray(x), method=f)

    outs = run(variables, x)
    assert len(outs) == len(outs_ref)
    for i, (o, r) in enumerate(zip(outs, outs_ref)):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 4, 1), rtol=2e-3, atol=2e-4,
            err_msg=f"block {i}",
        )


def test_x3d_classification_head_matches_oracle():
    # Kinetics video-classification capability (head kept for checkpoint
    # parity; never on a Change3D task path).
    cfg = dataclasses.replace(_tiny_cfg(), scan_blocks=False)
    sd = make_random_x3d_state_dict(cfg, seed=5)
    variables = convert_x3d_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)
    model = X3D(cfg)
    x = np.random.RandomState(6).randn(2, 3, 16, 16, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    ref = oracle_head(oracle_run_blocks(xt, sd, cfg)[-1], sd, cfg)
    got = model.apply(variables, jnp.asarray(x), classify=True)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-3, atol=2e-4)


def test_load_x3d_pretrained_torch_roundtrip(tmp_path):
    # End-to-end through torch serialization: the exact format X3D_L.pyth
    # uses ({'model_state': state_dict}), including scanned-pair packing.
    from change3d_tpu.checkpoint.convert import load_x3d_pretrained

    cfg = _tiny_cfg()  # scan_blocks=True default
    sd = make_random_x3d_state_dict(cfg, seed=9)
    path = tmp_path / "X3D_TINY.pyth"
    torch.save({"model_state": sd}, str(path))
    variables = load_x3d_pretrained(str(path), cfg)
    model = X3D(cfg)
    x = np.random.RandomState(10).randn(1, 3, 16, 16, 3).astype(np.float32)
    out = model.apply(variables, jnp.asarray(x))
    ref = oracle_run_blocks(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), sd, cfg)[-1]
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 4, 1), rtol=2e-3, atol=2e-4
    )


def test_x3d_full_param_count():
    # X3D-L Kinetics classifier is 6.15M params (paper Table); sans-head
    # backbone (what the Change3D tasks use) is 4.37M.
    cfg = x3d_l_config()
    model = X3D(cfg)
    x = jnp.zeros((1, 3, 8, 8, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, classify=True)
    count = lambda t: sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(t))
    assert count(variables["params"]) == 6_153_384
    backbone = {k: v for k, v in variables["params"].items() if k != "head"}
    assert count(backbone) == 4_365_240


def test_x3d_family_builder_m_variant():
    # The generic builder (x3d_config, ref create_x3d parity) reproduces the
    # X3D-M/S/XS weight set: 3.79 M params (pytorchvideo model zoo), depths
    # round_repeats([1,2,5,3], 2.2) = [3,5,11,7], stock (1,2,2) stem stride.
    from change3d_tpu.models.x3d import x3d_m_config

    cfg = x3d_m_config()
    assert cfg.stage_depths == (3, 5, 11, 7)
    assert cfg.stage_dims == (24, 48, 96, 192)
    assert cfg.stem_conv_stride == (1, 2, 2)
    model = X3D(cfg)
    x = jnp.zeros((1, 3, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, classify=True)
    count = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert count == 3_794_274  # 3.79 M
    # Stock stem stride halves spatial at the stem: 16 -> 8 -> stages /16.
    y = model.apply(variables, jnp.zeros((1, 3, 16, 16, 3), jnp.float32), train=False)
    assert y.shape == (1, 3, 1, 1, 192)
