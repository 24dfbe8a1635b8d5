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


# ---------------------------------------------------------------------------
# Full trained-Trainer conversion (migration of reference-trained models)
# ---------------------------------------------------------------------------

def _insert(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_change_decoder_key(rest: str):
    """`up_cK.0.weight` / `up_cK.1.{weight,bias}` / `up_c1.0.weight` ->
    (our path, converted array fn). Returns None for unknown keys."""
    parts = rest.split(".")
    if parts[0] == "up_c1" and parts[1] == "0" and parts[2] == "weight":
        # 3x3 head conv, bias-free (ref: change_decoder.py:53-55).
        return ("final",), lambda a: jnp.asarray(a.transpose(2, 3, 1, 0))
    if parts[0] in ("up_c4", "up_c3", "up_c2"):
        block = parts[0]
        if parts[1] == "0" and parts[2] == "weight":
            # 1x1 channel-reduce Conv2d (O,I,1,1) -> (1,1,I,O).
            return (block, "reduce"), lambda a: jnp.asarray(a.transpose(2, 3, 1, 0))
        if parts[1] == "1" and parts[2] == "weight":
            # ConvTranspose2d (I,O,kh,kw) -> (kh,kw,I,O), not pre-flipped
            # (ops.conv_transpose2d flips at apply time; torch parity tested).
            return (block, "up"), lambda a: jnp.asarray(a.transpose(2, 3, 0, 1))
        if parts[1] == "1" and parts[2] == "bias":
            return (block, "up_bias"), lambda a: jnp.asarray(a)
    return None


# Dead submodules of the reference Mesh_TransformerDecoderLayer: declared but
# never executed by its forward (ref: /root/reference/model/caption_decoder.py:
# 343-379 declares them, :395-423 uses only self_attn/norm1/multihead_attn2/
# norm2), so they have no counterpart in the live-path decoder here.
_DEAD_CC_LAYER_PREFIXES = (
    "self_attn2.", "multihead_attn3.", "linear1.", "linear2.", "norm3.",
    "fc_alpha1.", "fc_alpha2.", "fc_alpha3.",
)


def _convert_caption_decoder_key(rest: str):
    """CaptionDecoder keys -> (our path, convert fn) | 'skip' | None."""
    if rest == "vocab_embedding.weight":
        return ("vocab_embedding",), lambda a: jnp.asarray(a)
    if rest == "wdc.weight":
        return ("out_w",), lambda a: jnp.asarray(a.T)
    if rest == "wdc.bias":
        return ("out_b",), lambda a: jnp.asarray(a)
    if rest.startswith("position_encoding."):
        return "skip"  # sinusoidal buffer, recomputed here
    if rest.startswith("transformer.layers."):
        parts = rest.split(".", 3)  # transformer, layers, {l}, tail
        layer, tail = f"layer{parts[2]}", parts[3]
        if tail.startswith(_DEAD_CC_LAYER_PREFIXES):
            return "skip"
        for torch_mod, ours in (("self_attn.", "self_attn"), ("multihead_attn2.", "cross_attn")):
            if tail.startswith(torch_mod):
                sub = tail[len(torch_mod):]
                m = {
                    "in_proj_weight": ("in_proj_w", lambda a: jnp.asarray(a.T)),
                    "in_proj_bias": ("in_proj_b", lambda a: jnp.asarray(a)),
                    "out_proj.weight": ("out_w", lambda a: jnp.asarray(a.T)),
                    "out_proj.bias": ("out_b", lambda a: jnp.asarray(a)),
                }.get(sub)
                return ((layer, ours, m[0]), m[1]) if m else None
        if tail.startswith("multihead_attn."):  # dead (after attn2 check)
            return "skip"
        for norm in ("norm1", "norm2"):
            if tail == f"{norm}.weight":
                return (layer, norm, "scale"), lambda a: jnp.asarray(a)
            if tail == f"{norm}.bias":
                return (layer, norm, "bias"), lambda a: jnp.asarray(a)
    return None


def _prune_to_template(tree: dict, template) -> dict:
    """Drop subtrees the template does not materialize (e.g. x3d stage4/head
    for detection tasks — torch keeps the whole module resident,
    ref: /root/reference/model/trainer.py:44-48; flax only what runs)."""
    if not isinstance(template, dict):
        return tree
    return {
        k: _prune_to_template(v, template[k])
        for k, v in tree.items()
        if k in template
    }


def convert_trainer_state_dict(
    state_dict, template_variables: dict, cfg: X3DConfig | None = None, *, strict: bool = True
) -> dict:
    """Convert a *trained* reference ``Trainer`` state_dict into a full
    Change3D variables tree — the migration path for models trained with the
    reference (its ``best_model.pth`` / ``checkpoint.pth.tar['state_dict']``,
    ref: /root/reference/scripts/train_BCD.py:333-349).

    ``template_variables`` (from ``model.init``) fixes the target structure:
    converted backbone subtrees the task never materializes (stage4/head for
    detection) are pruned, and under ``strict`` every template leaf must be
    produced with the template's exact shape.
    """
    cfg = cfg or x3d_l_config()
    state = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in state_dict.items()
    }

    backbone_sd = {}
    params: dict = {}
    stats: dict = {}
    unknown = []
    for key, value in state.items():
        if key.startswith("encoder.x3d."):
            backbone_sd[key[len("encoder.x3d."):]] = value
            continue
        arr = np.asarray(value, dtype=np.float32)
        if key == "encoder.perception_frames":
            # torch [1, 3, N, H, W] -> ours [1, N, H, W, 3].
            _insert(
                params, ("encoder", "perception_frames"),
                jnp.asarray(arr.transpose(0, 2, 3, 4, 1)),
            )
            continue
        if key.startswith("encoder.fc."):
            parts = key.split(".")  # encoder, fc, {i}, 0, weight
            if parts[3] == "0" and parts[4] == "weight":
                # 1x1 bias-free Conv2d (D,D,1,1) -> pointwise [I, O].
                _insert(
                    params, ("encoder", f"fc{parts[2]}", "conv"),
                    jnp.asarray(arr[:, :, 0, 0].T),
                )
                continue
            unknown.append(key)
            continue
        head, rest = key.split(".", 1)
        if head in ("decoder", "decoder_pre", "decoder_post", "decoder_change",
                    "decoder_cls", "decoder_loc"):
            conv = _convert_change_decoder_key(rest)
            if conv is None and head == "decoder":
                conv = _convert_caption_decoder_key(rest)
            if conv == "skip":
                continue
            if conv is not None:
                path, fn = conv
                _insert(params, (head,) + tuple(path), fn(arr))
                continue
        unknown.append(key)

    backbone = convert_x3d_state_dict(backbone_sd, cfg, strict=strict)
    if cfg.scan_blocks:
        backbone = {
            "params": pack_scanned_stages(backbone["params"], cfg),
            "batch_stats": pack_scanned_stages(backbone["batch_stats"], cfg),
        }
    params.setdefault("encoder", {})["x3d"] = backbone["params"]
    stats = {"encoder": {"x3d": backbone["batch_stats"]}}

    t_params = template_variables["params"]
    t_stats = template_variables.get("batch_stats", {})
    params = _prune_to_template(params, t_params)
    stats = _prune_to_template(stats, t_stats)

    if strict:
        if unknown:
            raise ValueError(
                f"{len(unknown)} unmapped trainer keys, e.g. {unknown[:5]}"
            )

        def check(tmpl, got, where):
            t_leaves = {p: l for p, l in _flatten(tmpl)}
            g_leaves = {p: l for p, l in _flatten(got)}
            missing = sorted(set(t_leaves) - set(g_leaves))
            if missing:
                raise ValueError(f"{where}: missing {len(missing)} leaves, e.g. {missing[:5]}")
            for p, l in t_leaves.items():
                if tuple(g_leaves[p].shape) != tuple(l.shape):
                    raise ValueError(
                        f"{where}: shape mismatch at {p}: "
                        f"{g_leaves[p].shape} vs template {l.shape}"
                    )

        def _flatten(tree, prefix=()):
            out = []
            if isinstance(tree, dict):
                for k, v in tree.items():
                    out += _flatten(v, prefix + (k,))
            else:
                out.append(("/".join(prefix), tree))
            return out

        check(t_params, params, "params")
        check(t_stats, stats, "batch_stats")
    return {"params": params, "batch_stats": stats}


def load_trainer_pretrained(path: str, template_variables: dict, cfg: X3DConfig | None = None):
    """Read a reference-trained checkpoint (``best_model.pth`` weights-only
    state_dict, or ``checkpoint.pth.tar`` with a 'state_dict' entry) and
    convert it into Change3D variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_trainer_state_dict(state, template_variables, cfg)


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
