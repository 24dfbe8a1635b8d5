"""Independent torch oracle for X3D / Change3D semantics.

Built from the architecture *specification* (SURVEY.md §2.1 and the reference
builder configuration) using only torch functional ops — used to validate the
JAX implementation + checkpoint converter without pytorchvideo.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from change3d_tpu.models.x3d import X3DConfig, x3d_l_config


def make_random_x3d_state_dict(
    cfg: X3DConfig | None = None, seed: int = 0, fan_scaled: bool = False
):
    """Random state_dict with the exact pytorchvideo key names/shapes that
    X3D_L.pyth carries.

    ``fan_scaled=True`` rescales every conv/linear weight to std
    1/sqrt(fan_in) (LeCun magnitude). The default scale=0.2 is fine for the
    tiny test configs, but at full X3D-L depth (55 res blocks) per-layer
    gain > 1 compounds exponentially and activations reach ~1e13 by stage 4
    — where fp32 summation-order differences swamp any real parity signal.
    Trained checkpoints are variance-stable by construction; fan scaling
    makes the synthetic full-scale drill (tests/manual_verify_drill.py)
    match that regime."""
    cfg = cfg or x3d_l_config()
    rng = np.random.RandomState(seed)
    sd = {}

    def t(*shape, scale=0.2):
        return torch.from_numpy((rng.randn(*shape) * scale).astype(np.float32))

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c, scale=0.1) + 1.0
        sd[f"{prefix}.bias"] = t(c, scale=0.1)
        sd[f"{prefix}.running_mean"] = t(c, scale=0.1)
        sd[f"{prefix}.running_var"] = torch.abs(t(c, scale=0.1)) + 1.0
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    c0 = cfg.stem_dim_out
    sd["blocks.0.conv.conv_t.weight"] = t(c0, cfg.in_channels, 1, 3, 3)
    sd["blocks.0.conv.conv_xy.weight"] = t(c0, 1, 5, 1, 1)
    add_bn("blocks.0.norm", c0)

    for s in range(4):
        dim_in = c0 if s == 0 else cfg.stage_dims[s - 1]
        dim_out, inner = cfg.stage_dims[s], cfg.stage_inner_dims[s]
        se_dim = cfg.se_reduced_dim(s)
        for j in range(cfg.stage_depths[s]):
            p = f"blocks.{s + 1}.res_blocks.{j}"
            bi = dim_in if j == 0 else dim_out
            if j == 0:
                sd[f"{p}.branch1_conv.weight"] = t(dim_out, bi, 1, 1, 1)
                if bi != dim_out:
                    add_bn(f"{p}.branch1_norm", dim_out)
            sd[f"{p}.branch2.conv_a.weight"] = t(inner, bi, 1, 1, 1)
            add_bn(f"{p}.branch2.norm_a", inner)
            sd[f"{p}.branch2.conv_b.weight"] = t(inner, 1, 3, 3, 3)
            add_bn(f"{p}.branch2.norm_b.0", inner)
            if (j + 1) % 2:
                sd[f"{p}.branch2.norm_b.1.block.0.weight"] = t(se_dim, inner, 1, 1, 1)
                sd[f"{p}.branch2.norm_b.1.block.0.bias"] = t(se_dim)
                sd[f"{p}.branch2.norm_b.1.block.2.weight"] = t(inner, se_dim, 1, 1, 1)
                sd[f"{p}.branch2.norm_b.1.block.2.bias"] = t(inner)
            sd[f"{p}.branch2.conv_c.weight"] = t(dim_out, inner, 1, 1, 1)
            add_bn(f"{p}.branch2.norm_c", dim_out)

    inner = cfg.stage_inner_dims[-1]
    sd["blocks.5.pool.pre_conv.weight"] = t(inner, cfg.stage_dims[-1], 1, 1, 1)
    add_bn("blocks.5.pool.pre_norm", inner)
    sd["blocks.5.pool.post_conv.weight"] = t(cfg.head_dim_out, inner, 1, 1, 1)
    sd["blocks.5.proj.weight"] = t(cfg.num_classes, cfg.head_dim_out, scale=0.05)
    sd["blocks.5.proj.bias"] = t(cfg.num_classes)
    if fan_scaled:
        for k, v in sd.items():
            if k.endswith(".weight") and v.dim() >= 2:
                fan_in = int(np.prod(v.shape[1:]))
                sd[k] = v * (1.0 / (float(v.std()) * np.sqrt(fan_in)))
    return sd


def _bn(x, sd, prefix, eps=1e-5):
    return F.batch_norm(
        x,
        sd[f"{prefix}.running_mean"],
        sd[f"{prefix}.running_var"],
        sd[f"{prefix}.weight"],
        sd[f"{prefix}.bias"],
        training=False,
        eps=eps,
    )


def oracle_stem(x, sd):
    w_s = sd["blocks.0.conv.conv_t.weight"]
    w_t = sd["blocks.0.conv.conv_xy.weight"]
    x = F.conv3d(x, w_s, stride=(1, 1, 1), padding=(0, 1, 1))
    x = F.conv3d(x, w_t, stride=(1, 1, 1), padding=(2, 0, 0), groups=w_t.shape[0])
    return F.relu(_bn(x, sd, "blocks.0.norm"))


def oracle_block(x, sd, p, stride, has_se):
    shortcut = x
    if f"{p}.branch1_conv.weight" in sd:
        shortcut = F.conv3d(x, sd[f"{p}.branch1_conv.weight"], stride=stride)
        if f"{p}.branch1_norm.weight" in sd:
            shortcut = _bn(shortcut, sd, f"{p}.branch1_norm")
    b = F.relu(_bn(F.conv3d(x, sd[f"{p}.branch2.conv_a.weight"]), sd, f"{p}.branch2.norm_a"))
    w_b = sd[f"{p}.branch2.conv_b.weight"]
    b = F.conv3d(b, w_b, stride=stride, padding=1, groups=w_b.shape[0])
    b = _bn(b, sd, f"{p}.branch2.norm_b.0")
    if has_se:
        sq = b.mean(dim=(2, 3, 4), keepdim=True)
        g = F.relu(F.conv3d(sq, sd[f"{p}.branch2.norm_b.1.block.0.weight"], sd[f"{p}.branch2.norm_b.1.block.0.bias"]))
        g = torch.sigmoid(F.conv3d(g, sd[f"{p}.branch2.norm_b.1.block.2.weight"], sd[f"{p}.branch2.norm_b.1.block.2.bias"]))
        b = b * g
    b = b * torch.sigmoid(b)  # swish
    b = _bn(F.conv3d(b, sd[f"{p}.branch2.conv_c.weight"]), sd, f"{p}.branch2.norm_c")
    return F.relu(shortcut + b)


def oracle_head(x, sd, cfg: X3DConfig):
    """Kinetics head: pre_conv -> BN/ReLU -> global avg pool -> post_conv ->
    ReLU -> Linear -> global average (eval mode, dropout off)."""
    x = F.relu(_bn(F.conv3d(x, sd["blocks.5.pool.pre_conv.weight"]), sd, "blocks.5.pool.pre_norm"))
    x = x.mean(dim=(2, 3, 4), keepdim=True)
    x = F.relu(F.conv3d(x, sd["blocks.5.pool.post_conv.weight"]))
    x = x.permute(0, 2, 3, 4, 1)
    x = x @ sd["blocks.5.proj.weight"].T + sd["blocks.5.proj.bias"]
    return x.mean(dim=(1, 2, 3))


def oracle_run_blocks(x, sd, cfg: X3DConfig, num_blocks: int = 5):
    """x: torch [B, 3, T, H, W]. Returns list of outputs of blocks 0..num_blocks-1."""
    outs = []
    x = oracle_stem(x, sd)
    outs.append(x)
    for s in range(min(num_blocks - 1, 4)):
        for j in range(cfg.stage_depths[s]):
            stride = (1, cfg.stage_spatial_stride[s], cfg.stage_spatial_stride[s]) if j == 0 else (1, 1, 1)
            x = oracle_block(x, sd, f"blocks.{s + 1}.res_blocks.{j}", stride, has_se=bool((j + 1) % 2))
        outs.append(x)
    return outs
