"""One-shot converter: Kinetics ``X3D_L.pyth`` torch state_dict -> JAX pytree.

The reference loads ``torch.load(path)['model_state']`` strictly into its
pytorchvideo-built Net (ref: /root/reference/model/trainer.py:44-45). The
torch naming scheme for that Net is:

  blocks.0.conv.conv_t.weight          spatial 1x3x3 stem conv (the reference
                                       swaps Conv2plus1d's args, so 'conv_t'
                                       holds the spatial conv,
                                       ref: /root/reference/model/x3d.py:87-92)
  blocks.0.conv.conv_xy.weight         depthwise temporal 5x1x1 conv
  blocks.0.norm.{weight,bias,running_mean,running_var}
  blocks.S.res_blocks.J.branch1_conv.weight            (projection shortcut)
  blocks.S.res_blocks.J.branch1_norm.{...}             (only when dims change)
  blocks.S.res_blocks.J.branch2.conv_a.weight
  blocks.S.res_blocks.J.branch2.norm_a.{...}
  blocks.S.res_blocks.J.branch2.conv_b.weight          (depthwise 3x3x3)
  blocks.S.res_blocks.J.branch2.norm_b.0.{...}         (BN inside Sequential)
  blocks.S.res_blocks.J.branch2.norm_b.1.block.{0,2}.{weight,bias}  (SE convs)
  blocks.S.res_blocks.J.branch2.conv_c.weight
  blocks.S.res_blocks.J.branch2.norm_c.{...}
  blocks.5.pool.pre_conv.weight / pool.pre_norm.{...} / pool.post_conv.weight
  blocks.5.proj.{weight,bias}

Weight layout conversions (torch OIDHW -> our DHWIO; pointwise -> [I, O]):
done once at load, so no runtime transposition exists in the model.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from change3d_tpu.models.x3d import X3DConfig, x3d_l_config


def _conv5d(w: np.ndarray) -> jnp.ndarray:
    """(O, I/g, kd, kh, kw) -> (kd, kh, kw, I/g, O)."""
    return jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0))))


def _pointwise(w: np.ndarray) -> jnp.ndarray:
    """(O, I, 1, 1, 1) -> (I, O)."""
    return jnp.asarray(np.ascontiguousarray(w[:, :, 0, 0, 0].T))


def x3d_torch_key_map(cfg: X3DConfig | None = None) -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """Maps every torch checkpoint key -> (our tree path, conversion kind).

    Tree paths are relative to the X3D module: e.g. ('stem', 'conv_s').
    Conversion kinds: 'conv' (5d), 'pointwise', 'dense' (2d transpose),
    'raw' (copy), 'skip'.
    """
    cfg = cfg or x3d_l_config()
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {}

    def bn(torch_prefix: str, path: Tuple[str, ...]):
        m[f"{torch_prefix}.weight"] = (path + ("scale",), "raw")
        m[f"{torch_prefix}.bias"] = (path + ("bias",), "raw")
        m[f"{torch_prefix}.running_mean"] = (path + ("mean",), "raw")
        m[f"{torch_prefix}.running_var"] = (path + ("var",), "raw")
        m[f"{torch_prefix}.num_batches_tracked"] = ((), "skip")

    # Stem.
    m["blocks.0.conv.conv_t.weight"] = (("stem", "conv_s"), "conv")
    m["blocks.0.conv.conv_xy.weight"] = (("stem", "conv_t"), "conv")
    bn("blocks.0.norm", ("stem", "bn"))

    # Stages.
    for s in range(4):
        dim_in = cfg.stem_dim_out if s == 0 else cfg.stage_dims[s - 1]
        dim_out = cfg.stage_dims[s]
        for j in range(cfg.stage_depths[s]):
            tp = f"blocks.{s + 1}.res_blocks.{j}"
            op = ("stage" + str(s + 1), f"block{j}")
            if j == 0:
                m[f"{tp}.branch1_conv.weight"] = (op + ("proj",), "conv")
                if dim_in != dim_out:
                    bn(f"{tp}.branch1_norm", op + ("proj_bn",))
            bt = op + ("bottleneck",)
            m[f"{tp}.branch2.conv_a.weight"] = (bt + ("conv_a",), "pointwise")
            bn(f"{tp}.branch2.norm_a", bt + ("bn_a",))
            m[f"{tp}.branch2.conv_b.weight"] = (bt + ("conv_b",), "conv")
            bn(f"{tp}.branch2.norm_b.0", bt + ("bn_b",))
            if (j + 1) % 2:  # SE on even-indexed blocks
                m[f"{tp}.branch2.norm_b.1.block.0.weight"] = (bt + ("se", "w_reduce"), "pointwise")
                m[f"{tp}.branch2.norm_b.1.block.0.bias"] = (bt + ("se", "b_reduce"), "raw")
                m[f"{tp}.branch2.norm_b.1.block.2.weight"] = (bt + ("se", "w_expand"), "pointwise")
                m[f"{tp}.branch2.norm_b.1.block.2.bias"] = (bt + ("se", "b_expand"), "raw")
            m[f"{tp}.branch2.conv_c.weight"] = (bt + ("conv_c",), "pointwise")
            bn(f"{tp}.branch2.norm_c", bt + ("bn_c",))

    # Head.
    m["blocks.5.pool.pre_conv.weight"] = (("head", "pre_conv"), "pointwise")
    bn("blocks.5.pool.pre_norm", ("head", "pre_bn"))
    m["blocks.5.pool.post_conv.weight"] = (("head", "post_conv"), "pointwise")
    m["blocks.5.proj.weight"] = (("head", "proj_w"), "dense")
    m["blocks.5.proj.bias"] = (("head", "proj_b"), "raw")
    return m


_BN_STAT_NAMES = ("mean", "var")


def convert_x3d_state_dict(state_dict, cfg: X3DConfig | None = None, *, strict: bool = True):
    """Convert a torch X3D state_dict (numpy-able values) into
    {'params': tree, 'batch_stats': tree} matching our X3D module."""
    cfg = cfg or x3d_l_config()
    key_map = x3d_torch_key_map(cfg)
    params: dict = {}
    stats: dict = {}

    def insert(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    unused = []
    for key, value in state_dict.items():
        if key not in key_map:
            unused.append(key)
            continue
        path, kind = key_map[key]
        if kind == "skip":
            continue
        arr = np.asarray(value, dtype=np.float32)
        if kind == "conv":
            converted = _conv5d(arr)
        elif kind == "pointwise":
            converted = _pointwise(arr)
        elif kind == "dense":
            converted = jnp.asarray(arr.T)
        else:
            converted = jnp.asarray(arr)
        target = stats if path[-1] in _BN_STAT_NAMES else params
        insert(target, path, converted)

    if strict:
        missing = [k for k in key_map if k not in state_dict and key_map[k][1] != "skip"]
        if missing:
            raise ValueError(f"Checkpoint missing {len(missing)} keys, e.g. {missing[:5]}")
        if unused:
            raise ValueError(f"Checkpoint has {len(unused)} unmapped keys, e.g. {unused[:5]}")
    return {"params": params, "batch_stats": stats}


def pack_scanned_stages(tree: dict, cfg: X3DConfig | None = None) -> dict:
    """Repack an unrolled per-block tree into the scan_blocks layout.

    For each stage, blocks 1..2p are stacked pairwise into
    ``pairs/{a,b}/...`` with a leading scan axis (a = odd/non-SE blocks,
    b = even/SE blocks, matching BlockPair); block0 and an odd trailing
    block stay unrolled. Works for both params and batch_stats subtrees.
    """
    import jax

    cfg = cfg or x3d_l_config()
    out = dict(tree)
    for s in range(4):
        key = f"stage{s + 1}"
        if key not in tree:
            continue
        stage = dict(tree[key])
        depth = cfg.stage_depths[s]
        n_pairs = (depth - 1) // 2
        if n_pairs <= 0:
            out[key] = stage
            continue
        a_blocks = [stage.pop(f"block{2 * p + 1}") for p in range(n_pairs)]
        b_blocks = [stage.pop(f"block{2 * p + 2}") for p in range(n_pairs)]
        stage["pairs"] = {
            "a": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *a_blocks),
            "b": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *b_blocks),
        }
        out[key] = stage
    return out


def load_x3d_pretrained(path: str, cfg: X3DConfig | None = None):
    """Read ``X3D_L.pyth`` (torch serialized, 'model_state' entry) and convert.

    torch is imported lazily — it is only needed for deserialization, never at
    train time.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt)
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}
    converted = convert_x3d_state_dict(state, cfg)
    if (cfg or x3d_l_config()).scan_blocks:
        converted = {
            "params": pack_scanned_stages(converted["params"], cfg),
            "batch_stats": pack_scanned_stages(converted["batch_stats"], cfg),
        }
    return converted


def merge_backbone_variables(variables: dict, backbone: dict, *, drop_head: bool = True) -> dict:
    """Insert converted backbone {'params','batch_stats'} under
    encoder/x3d in a full Change3D variable tree (pure function).

    The Kinetics classification head is dropped by default — no Change3D task
    executes it (ref: /root/reference/model/trainer.py:120-139 runs blocks 0-4
    only), and keeping it would add dead weights to the optimizer state.
    """
    import flax

    bb_params = dict(backbone["params"])
    bb_stats = dict(backbone["batch_stats"])
    if drop_head:
        bb_params.pop("head", None)
        bb_stats.pop("head", None)
    variables = flax.core.unfreeze(variables)
    variables["params"]["encoder"]["x3d"] = bb_params
    variables.setdefault("batch_stats", {}).setdefault("encoder", {})["x3d"] = bb_stats
    return variables
