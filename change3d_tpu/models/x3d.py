"""X3D video backbone, TPU-native (NDHWC, functional flax.linen).

Reproduces the exact architecture the reference instantiates
(``create_x3d(input_clip_length=3, depth_factor=5.0)``, ref:
/root/reference/model/trainer.py:40 → /root/reference/model/x3d.py:543-744)
so the public Kinetics-400 ``X3D_L.pyth`` checkpoint maps 1:1:

- stem: 1x3x3 spatial conv then *depthwise* 5x1x1 temporal conv, BN, ReLU,
  with the Change3D modification ``stem_conv_stride=(1,1,1)`` (ref:
  /root/reference/model/x3d.py:563-564) that keeps full spatial resolution;
- 4 stages of bottleneck res-blocks, widths [24,48,96,192], inner dims
  [54,108,216,432] (bottleneck_factor 2.25), depths [5,10,25,15]
  (round_repeats([1,2,5,3], 5.0)), spatial stride 2 / temporal stride 1 on
  the first block of each stage (ref: /root/reference/model/x3d.py:672-709);
- squeeze-excitation on every *even-indexed* block ((idx+1) % 2, ref:
  /root/reference/model/x3d.py:406), reduced dims via divisor-8 rounding;
- bottleneck: 1x1x1 -> BN/ReLU -> depthwise 3x3x3 -> BN -> (SE) -> Swish ->
  1x1x1 -> BN (ref: /root/reference/model/x3d.py:109-232);
- res block: projection 1x1x1 shortcut when dims or stride change; the
  shortcut BN exists only when dims change (ref:
  /root/reference/model/x3d.py:296-312 — stage 1's first block strides
  without a shortcut BN because 24 == 24);
- classification head (ProjectedPool -> dropout -> Linear 400) for Kinetics
  parity (ref: /root/reference/model/x3d.py:415-540); never executed by any
  Change3D task path but kept for checkpoint completeness.

Activations are [B, T, H, W, C]; all pointwise convs are MXU matmuls.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from change3d_tpu.init import torch_conv_kernel_init
from change3d_tpu.ops.layers import (
    conv3d,
    depthwise_conv3d,
    pointwise_conv3d,
    swish,
    squeeze_excite_3d,
    linear,
)
from change3d_tpu.ops.norm import BatchNorm


def round_width(width, multiplier, min_width: int = 8, divisor: int = 8) -> int:
    """Divisor-8 width rounding with the 0.9 guard (pytorchvideo semantics,
    ref: /root/reference/model/x3d.py:16 usage sites)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def round_repeats(repeats: int, multiplier: float) -> int:
    if not multiplier:
        return repeats
    return int(math.ceil(multiplier * repeats))


@dataclass(frozen=True)
class X3DConfig:
    """Derived X3D architecture description."""

    in_channels: int = 3
    stem_dim_out: int = 24
    stage_dims: Tuple[int, ...] = (24, 48, 96, 192)
    stage_inner_dims: Tuple[int, ...] = (54, 108, 216, 432)
    stage_depths: Tuple[int, ...] = (5, 10, 25, 15)
    stage_spatial_stride: Tuple[int, ...] = (2, 2, 2, 2)
    stage_temporal_stride: Tuple[int, ...] = (1, 1, 1, 1)
    stem_conv_stride: Tuple[int, int, int] = (1, 1, 1)
    se_ratio: float = 0.0625
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    # Head (Kinetics classifier) — unused by Change3D tasks.
    head_dim_out: int = 2048
    num_classes: int = 400
    dropout_rate: float = 0.5
    # Roll uniform residual blocks into a lax.scan (compiler-friendly control
    # flow): HLO shrinks ~5x, which matters because cold-compiling the
    # unrolled 55-block train step takes minutes. Identical math; parameters
    # of scanned blocks are stacked along a leading axis.
    scan_blocks: bool = True
    # Run eligible stride-1 blocks as one fused Pallas kernel at eval time
    # (ops/pallas/fused_block.py). Same parameter tree; inference only.
    fused_inference: bool = False
    # Also use the H-tiled halo-DMA kernel for blocks too large for VMEM
    # (stages 1-2). Off by default: this environment's remote-compile service
    # crashes on Pallas manual DMAs (minimal repro: tests/manual_dma_probe);
    # enable on standard TPU stacks.
    fused_htiled: bool = False
    # Rematerialize stage activations in the backward pass (jax.checkpoint):
    # trades FLOPs for memory, enabling larger per-chip batches at 256^2.
    remat: bool = False
    # Eval-time time-packed execution for the listed stage indices (0-based):
    # activations run as [B, H, W, C*T] with dense banded kernels — measured
    # 1.99x on the stem+stage1 segment (ops/packed.py, ARCHITECTURE.md).
    packed_eval_stages: Tuple[int, ...] = ()
    # Use the packed path at *training* time too for those stages: the dense
    # expansions are differentiable and BatchNorm supports packed per-c batch
    # statistics (packed_t), so math and variables are identical.
    packed_train: bool = False
    # Eval-time dynamic int8 quantization of the MXU-shaped convs (pointwise
    # 1x1x1 + the packed dense banded convs): per-output-channel weight
    # scales, per-sample activation scales computed on the fly (ops/quant.py).
    # Same parameter tree (weights quantize at trace time); inference only.
    # Takes precedence over fused_inference on eligible blocks.
    quantized_eval: bool = False
    # Activation-scale regime for quantized_eval:
    #   'dynamic'   per-sample scales computed on the fly (no calibration);
    #   'calibrate' fp32 forward that RECORDS per-site max-abs into the
    #               mutable 'quant' variable collection;
    #   'static'    frozen calibrated scales — the quantize becomes pure
    #               elementwise with constant scale (fuses into the producer
    #               epilogue; no runtime reduction). Requires a prior
    #               calibrate pass in the SAME packed/fused configuration.
    quant_mode: str = "dynamic"

    def se_reduced_dim(self, stage_idx: int) -> int:
        return round_width(self.stage_inner_dims[stage_idx], self.se_ratio)


def block_runs_packed(cfg: X3DConfig, i: int, train: bool) -> bool:
    """True when block i of [stem, stage1..stage4] executes time-packed.

    Single source of truth for the packing gates: X3DStem / X3DStage use it to
    decide their own execution layout, and the Encoder uses it to keep
    activations packed *across* block boundaries (enhance + taps run packed),
    eliminating interior pack/unpack pairs."""
    if i == 0:
        return (
            -1 in cfg.packed_eval_stages
            and cfg.stem_conv_stride[0] == 1
            and (not train or cfg.packed_train)
        )
    s = i - 1
    return (
        s in cfg.packed_eval_stages
        and cfg.stage_temporal_stride[s] == 1
        and (not train or cfg.packed_train)
    )


def x3d_config(
    width_factor: float = 2.0,
    depth_factor: float = 2.2,
    bottleneck_factor: float = 2.25,
    stem_dim_in: int = 12,
    base_depths: Tuple[int, ...] = (1, 2, 5, 3),
    stem_conv_stride: Tuple[int, int, int] = (1, 1, 1),
    **overrides,
) -> X3DConfig:
    """Generic X3D family builder — the TPU-native counterpart of the
    reference's parameterized ``create_x3d`` (ref:
    /root/reference/model/x3d.py:543-744): widths derived by doubling the
    stem width per stage with divisor-8 rounding, depths by ``round_repeats``
    of the base [1,2,5,3]. ``stem_conv_stride`` defaults to Change3D's
    (1,1,1) modification; pass (1,2,2) for stock X3D. Extra X3DConfig fields
    go through ``overrides``."""
    dims, inners, depths = [], [], []
    d = stem_dim_in
    for i in range(4):
        if i > 0:
            d = round_width(d, 2.0, divisor=8)
        dim_out = round_width(d, width_factor)
        dims.append(dim_out)
        inners.append(int(bottleneck_factor * dim_out))
        depths.append(round_repeats(base_depths[i], depth_factor))
    return X3DConfig(
        stem_dim_out=round_width(stem_dim_in, width_factor),
        stage_dims=tuple(dims),
        stage_inner_dims=tuple(inners),
        stage_depths=tuple(depths),
        stem_conv_stride=stem_conv_stride,
        **overrides,
    )


def x3d_l_config() -> X3DConfig:
    """The exact instantiation used by Change3D: width_factor=2.0,
    depth_factor=5.0, bottleneck_factor=2.25, stem stride (1,1,1)
    (ref: /root/reference/model/trainer.py:40-43, 6.15 M params)."""
    return x3d_config(width_factor=2.0, depth_factor=5.0)


def x3d_m_config() -> X3DConfig:
    """X3D-M/S/XS network config (width 2.0, depth 2.2 — the XS/S/M variants
    share weights and differ only in input resolution/frames; 3.79 M params
    per the pytorchvideo model zoo). Stock stem stride, since Change3D's
    stride-1 modification is specific to its L instantiation."""
    return x3d_config(width_factor=2.0, depth_factor=2.2, stem_conv_stride=(1, 2, 2))


class X3DStem(nn.Module):
    """Spatial 1x3x3 conv -> depthwise temporal 5x1x1 conv -> BN -> ReLU.

    The reference wires the Conv2plus1d with swapped arguments so the spatial
    conv runs first (ref: /root/reference/model/x3d.py:87-92); both convs are
    bias-free, the temporal conv is grouped per-channel.
    """

    cfg: X3DConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool, keep_packed: bool = False
    ) -> jax.Array:
        c_out = self.cfg.stem_dim_out
        st, ss = self.cfg.stem_conv_stride[0], self.cfg.stem_conv_stride[1]
        conv_s = self.param(
            "conv_s", torch_conv_kernel_init, (1, 3, 3, self.cfg.in_channels, c_out)
        )
        conv_t = self.param("conv_t", torch_conv_kernel_init, (5, 1, 1, 1, c_out))
        bn = BatchNorm(momentum=self.cfg.bn_momentum, eps=self.cfg.bn_eps, name="bn")

        t = x.shape[1]
        if block_runs_packed(self.cfg, 0, train):
            from change3d_tpu.ops import packed as pk

            # Fully-packed stem. Measured on the bench config (batch 64,
            # bf16, 256², with stage 1 also packed): no stem packing 481,
            # this dense-spatial variant 455, a hybrid that kept the spatial
            # conv per-frame and packed only the temporal conv 438 pairs/s —
            # stem packing LOSES on this chip in every form (the standard
            # stem's convs lower well despite C=24 lane padding), so -1 is
            # not in any production packed-stage set; the path is kept for
            # configs where a fully-packed pipeline matters more than the
            # stem itself (and it is train-capable via packed BN stats).
            xp = pk.pack(x)
            xp = pk.conv2d_packed(
                xp, pk.expand_conv_spatial(conv_s[0], t), stride=ss, padding=1
            )
            # depthwise temporal 5x1x1 -> dense banded 1x1 packed conv
            xp = pk.conv2d_packed(
                xp, pk.expand_depthwise(conv_t[:, :, :, 0, :], t)
            )
            # Packed-aware BN handles both eval (repeated running stats) and
            # train (per-c batch statistics over batch/space/t).
            xp = bn(xp, use_running_average=not train, packed_t=t)
            xp = jax.nn.relu(xp)
            return xp if keep_packed else pk.unpack(xp, t)

        x = conv3d(x, conv_s, stride=(1, ss, ss), padding=(0, 1, 1))
        x = depthwise_conv3d(x, conv_t, stride=(st, 1, 1), padding=(2, 0, 0))
        x = bn(x, use_running_average=not train)
        return jax.nn.relu(x)


class SqueezeExcite(nn.Module):
    """fvcore SqueezeExcitation(is_3d=True): pool -> fc reduce -> ReLU -> fc
    expand -> sigmoid -> scale (ref: /root/reference/model/x3d.py:194-202).
    The two 1x1x1 convs carry biases."""

    dim: int
    reduced_dim: int

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        w_r = self.param("w_reduce", torch_conv_kernel_init, (self.dim, self.reduced_dim))
        b_r = self.param("b_reduce", nn.initializers.zeros, (self.reduced_dim,))
        w_e = self.param("w_expand", torch_conv_kernel_init, (self.reduced_dim, self.dim))
        b_e = self.param("b_expand", nn.initializers.zeros, (self.dim,))
        if return_params:
            return w_r, b_r, w_e, b_e
        return squeeze_excite_3d(x, w_r, b_r, w_e, b_e)


class X3DBottleneck(nn.Module):
    """conv_a(1x1x1) -> BN/ReLU -> conv_b(depthwise 3x3x3, stride) -> BN ->
    [SE] -> Swish -> conv_c(1x1x1) -> BN (ref: /root/reference/model/x3d.py:109-232)."""

    dim_in: int
    dim_inner: int
    dim_out: int
    stride: Tuple[int, int, int]
    se_reduced_dim: int  # 0 disables SE
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    quantized: bool = False  # int8 MXU convs at eval (ops/quant.py)
    quant_mode: str = "dynamic"  # 'dynamic' | 'calibrate' | 'static'

    def _quant_sites(self, sites):
        """Per-site calibrated max-abs variables ('quant' collection); only
        materialized for the static/calibrate regimes so the dynamic path
        keeps the plain variable tree."""
        return {
            k: self.variable("quant", f"amax_{k}", lambda: jnp.zeros((), jnp.float32))
            for k in sites
        }

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool,
        fused_residual: Optional[str] = None,
        packed_t: int = 0,
    ) -> jax.Array:
        """``fused_residual`` in {'full', 'htiled'} (eval, stride-1,
        dim-preserving only) runs the whole block INCLUDING the residual
        add + ReLU as one Pallas kernel (see ops/pallas/fused_block.py).
        ``packed_t > 0`` consumes/produces time-packed [B, H, W, C*T]
        activations (T = packed_t frames) with dense banded kernels
        (ops/packed.py). Either way the parameter tree is identical."""
        bn = lambda name: BatchNorm(momentum=self.bn_momentum, eps=self.bn_eps, name=name)
        conv_a = self.param("conv_a", torch_conv_kernel_init, (self.dim_in, self.dim_inner))

        if packed_t:
            assert self.stride[0] == 1
            from change3d_tpu.ops import packed as pk

            t = packed_t
            s = self.stride[1]
            qmode = self.quant_mode if (self.quantized and not train) else None
            if qmode:
                from change3d_tpu.ops import quant
            amax = (
                self._quant_sites(("a", "b", "c"))
                if qmode in ("static", "calibrate") else None
            )

            def conv2d_p(h, w, site, *, stride=1, padding=0):
                if qmode == "dynamic":
                    return quant.conv2d_int8(h, w, stride=stride, padding=padding)
                if qmode == "calibrate":
                    v = amax[site]
                    v.value = jnp.maximum(v.value, quant.batch_amax(h))
                elif qmode == "static":
                    return quant.conv2d_int8_static(
                        h, w, amax[site].value, stride=stride, padding=padding
                    )
                return pk.conv2d_packed(h, w, stride=stride, padding=padding)

            h = conv2d_p(x, pk.expand_pointwise(conv_a, t), "a")
            h = jax.nn.relu(bn("bn_a")(h, use_running_average=not train, packed_t=t))
            conv_b = self.param("conv_b", torch_conv_kernel_init, (3, 3, 3, 1, self.dim_inner))
            h = conv2d_p(h, pk.expand_depthwise(conv_b[:, :, :, 0, :], t), "b", stride=s, padding=1)
            h = bn("bn_b")(h, use_running_average=not train, packed_t=t)
            if self.se_reduced_dim > 0:
                w_r, b_r, w_e, b_e = SqueezeExcite(
                    self.dim_inner, self.se_reduced_dim, name="se"
                )(None, return_params=True)
                h = pk.se_packed(h, w_r, b_r, w_e, b_e, t)
            h = swish(h)
            conv_c = self.param("conv_c", torch_conv_kernel_init, (self.dim_inner, self.dim_out))
            h = conv2d_p(h, pk.expand_pointwise(conv_c, t), "c")
            return bn("bn_c")(h, use_running_average=not train, packed_t=t)

        if fused_residual:
            assert not train and self.stride == (1, 1, 1) and self.dim_in == self.dim_out
            from change3d_tpu.ops.pallas.fused_block import (
                fused_bottleneck_block,
                fused_bottleneck_block_htiled,
            )

            zi = jnp.zeros((1, self.dim_inner), x.dtype)
            zo = jnp.zeros((1, self.dim_out), x.dtype)
            a_a, b_a = bn("bn_a")(zi, use_running_average=True, return_folded=True)
            conv_b = self.param("conv_b", torch_conv_kernel_init, (3, 3, 3, 1, self.dim_inner))
            a_b, b_b = bn("bn_b")(zi, use_running_average=True, return_folded=True)
            se = None
            if self.se_reduced_dim > 0:
                se = SqueezeExcite(self.dim_inner, self.se_reduced_dim, name="se")(
                    None, return_params=True
                )
            conv_c = self.param("conv_c", torch_conv_kernel_init, (self.dim_inner, self.dim_out))
            a_c, b_c = bn("bn_c")(zo, use_running_average=True, return_folded=True)
            args = (x, conv_a, a_a, b_a, conv_b[:, :, :, 0, :], a_b, b_b, conv_c, a_c, b_c, se)
            if fused_residual == "htiled":
                return fused_bottleneck_block_htiled(*args, h_tile=16)
            return fused_bottleneck_block(*args)

        qmode = self.quant_mode if (self.quantized and not train) else None
        if qmode:
            from change3d_tpu.ops import quant
        amax = (
            self._quant_sites(("a", "c"))
            if qmode in ("static", "calibrate") else None
        )

        def pw(h, w, site):
            if qmode == "dynamic":
                return quant.pointwise_conv3d_int8(h, w)
            if qmode == "calibrate":
                v = amax[site]
                v.value = jnp.maximum(v.value, quant.batch_amax(h))
            elif qmode == "static":
                return quant.pointwise_conv3d_int8_static(h, w, amax[site].value)
            return pointwise_conv3d(h, w)

        x = pw(x, conv_a, "a")
        x = jax.nn.relu(bn("bn_a")(x, use_running_average=not train))

        conv_b = self.param("conv_b", torch_conv_kernel_init, (3, 3, 3, 1, self.dim_inner))
        x = depthwise_conv3d(x, conv_b, stride=self.stride, padding=(1, 1, 1))
        x = bn("bn_b")(x, use_running_average=not train)
        if self.se_reduced_dim > 0:
            x = SqueezeExcite(self.dim_inner, self.se_reduced_dim, name="se")(x)
        x = swish(x)

        conv_c = self.param("conv_c", torch_conv_kernel_init, (self.dim_inner, self.dim_out))
        x = pw(x, conv_c, "c")
        return bn("bn_c")(x, use_running_average=not train)


class X3DResBlock(nn.Module):
    """relu(shortcut(x) + bottleneck(x)).

    Projection shortcut (1x1x1 conv, strided) exists when dims differ or the
    block strides; the shortcut BN exists only when dims differ
    (ref: /root/reference/model/x3d.py:296-312).
    """

    dim_in: int
    dim_inner: int
    dim_out: int
    stride: Tuple[int, int, int]
    se_reduced_dim: int
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    fused_inference: bool = False
    fused_htiled: bool = False
    quantized: bool = False
    quant_mode: str = "dynamic"

    # Per-sample VMEM budget for the fused kernel's padded inner tensor (f32).
    # 6 MB admits stage 3 at 256^2 inputs ((3+2)*34*34*216*4 = 4.99 MB), which
    # the previous 4 MB budget silently excluded; stage 1/2 still fall back
    # (18.3 / 9.4 MB).
    _FUSED_VMEM_LIMIT = 6 * 1024 * 1024

    def _fuse_mode(self, x, train: bool):
        if not self.fused_inference or train or self.quantized:
            return None
        if self.dim_in != self.dim_out or any(s > 1 for s in self.stride):
            return None
        t, h, w = x.shape[1], x.shape[2], x.shape[3]
        padded_bytes = (t + 2) * (h + 2) * (w + 2) * self.dim_inner * 4
        if padded_bytes <= self._FUSED_VMEM_LIMIT:
            return "full"
        if self.fused_htiled and h % 16 == 0 and h >= 32:
            return "htiled"
        return None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool, packed_t: int = 0) -> jax.Array:
        if not packed_t:
            mode = self._fuse_mode(x, train)
            if mode:
                return X3DBottleneck(
                    self.dim_in, self.dim_inner, self.dim_out, self.stride,
                    self.se_reduced_dim, self.bn_momentum, self.bn_eps,
                    quantized=self.quantized, quant_mode=self.quant_mode,
                    name="bottleneck",
                )(x, train=False, fused_residual=mode)
        needs_proj = self.dim_in != self.dim_out or any(s > 1 for s in self.stride)
        shortcut = x
        if needs_proj:
            proj = self.param("proj", torch_conv_kernel_init, (1, 1, 1, self.dim_in, self.dim_out))
            if packed_t:
                from change3d_tpu.ops import packed as pk

                shortcut = pk.conv2d_packed(
                    x, pk.expand_pointwise(proj[0, 0, 0], packed_t), stride=self.stride[1]
                )
            else:
                shortcut = conv3d(x, proj, stride=self.stride, padding=(0, 0, 0))
            if self.dim_in != self.dim_out:
                bn_p = BatchNorm(momentum=self.bn_momentum, eps=self.bn_eps, name="proj_bn")
                if packed_t:
                    shortcut = bn_p(
                        shortcut, use_running_average=not train, packed_t=packed_t
                    )
                else:
                    shortcut = bn_p(shortcut, use_running_average=not train)
        branch = X3DBottleneck(
            self.dim_in,
            self.dim_inner,
            self.dim_out,
            self.stride,
            self.se_reduced_dim,
            self.bn_momentum,
            self.bn_eps,
            quantized=self.quantized,
            quant_mode=self.quant_mode,
            name="bottleneck",
        )(x, train=train, packed_t=packed_t)
        return jax.nn.relu(shortcut + branch)


class BlockPair(nn.Module):
    """One scan step: a non-SE block followed by an SE block (the repeating
    unit of every stage after block 0, since SE sits on even block indices)."""

    dim: int
    dim_inner: int
    se_reduced_dim: int
    bn_momentum: float
    bn_eps: float
    train: bool
    fused_inference: bool = False
    fused_htiled: bool = False
    packed_t: int = 0
    quantized: bool = False
    quant_mode: str = "dynamic"

    @nn.compact
    def __call__(self, x, _):
        common = dict(
            dim_in=self.dim, dim_inner=self.dim_inner, dim_out=self.dim,
            stride=(1, 1, 1), bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
            fused_inference=self.fused_inference,
            fused_htiled=self.fused_htiled,
            quantized=self.quantized,
            quant_mode=self.quant_mode,
        )
        x = X3DResBlock(se_reduced_dim=0, name="a", **common)(
            x, train=self.train, packed_t=self.packed_t
        )
        x = X3DResBlock(se_reduced_dim=self.se_reduced_dim, name="b", **common)(
            x, train=self.train, packed_t=self.packed_t
        )
        return x, None


class X3DStage(nn.Module):
    """Sequential res blocks; stride + dim change on block 0 only, SE on
    even-indexed blocks (ref: /root/reference/model/x3d.py:394-412).

    With ``cfg.scan_blocks`` the repeating (non-SE, SE) block pairs after
    block 0 run under one ``nn.scan`` whose parameters are stacked on a
    leading axis; an odd trailing block stays unrolled. Same math as the
    reference loop — only the program representation changes.
    """

    cfg: X3DConfig
    stage_idx: int
    dim_in: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool,
        packed_in: int = 0,
        keep_packed: bool = False,
    ) -> jax.Array:
        """``packed_in > 0``: x arrives time-packed [B, H, W, C*T] with
        T = packed_in frames; ``keep_packed``: leave the output packed when
        this stage itself runs packed (the Encoder then carries the packed
        layout across enhance/taps instead of round-tripping)."""
        i = self.stage_idx
        cfg = self.cfg
        depth = cfg.stage_depths[i]
        dim_out, dim_inner = cfg.stage_dims[i], cfg.stage_inner_dims[i]
        se_dim = cfg.se_reduced_dim(i)
        first_stride = (
            cfg.stage_temporal_stride[i],
            cfg.stage_spatial_stride[i],
            cfg.stage_spatial_stride[i],
        )

        # Packed execution works for any clip length T (the ops/packed.py
        # expansions are T-parameterized); T is read from the activation shape
        # at trace time so SCD (T=5) / BDA (T=4) pack correctly too.
        t = packed_in if packed_in else x.shape[1]
        packed_t = t if block_runs_packed(cfg, i + 1, train) else 0

        def block(b, dim_in, stride):
            return X3DResBlock(
                dim_in=dim_in,
                dim_inner=dim_inner,
                dim_out=dim_out,
                stride=stride,
                se_reduced_dim=se_dim if (b + 1) % 2 else 0,
                bn_momentum=cfg.bn_momentum,
                bn_eps=cfg.bn_eps,
                fused_inference=cfg.fused_inference,
                fused_htiled=cfg.fused_htiled,
                quantized=cfg.quantized_eval,
                quant_mode=cfg.quant_mode,
                name=f"block{b}",
            )

        from change3d_tpu.ops import packed as pk

        if packed_t and not packed_in:
            x = pk.pack(x)
        elif packed_in and not packed_t:
            x = pk.unpack(x, packed_in)
        x = block(0, self.dim_in, first_stride)(x, train=train, packed_t=packed_t)
        rest = depth - 1
        n_pairs = rest // 2
        if cfg.scan_blocks and n_pairs > 0:
            # remat-of-scan: recompute each block pair in the backward pass —
            # the standard memory-efficient deep-residual pattern.
            pair_cls = nn.remat(BlockPair) if cfg.remat else BlockPair
            scanned = nn.scan(
                pair_cls,
                variable_axes={"params": 0, "batch_stats": 0, "quant": 0},
                split_rngs={"params": True},
                length=n_pairs,
            )(
                dim_out, dim_inner, se_dim, cfg.bn_momentum, cfg.bn_eps, train,
                cfg.fused_inference, cfg.fused_htiled, packed_t,
                cfg.quantized_eval, cfg.quant_mode,
                name="pairs",
            )
            x, _ = scanned(x, None)
            if rest % 2:  # trailing odd-index (non-SE) block
                x = block(depth - 1, dim_out, (1, 1, 1))(x, train=train, packed_t=packed_t)
        else:
            for b in range(1, depth):
                x = block(b, dim_out, (1, 1, 1))(x, train=train, packed_t=packed_t)
        if packed_t and not keep_packed:
            x = pk.unpack(x, packed_t)
        return x


class X3DHead(nn.Module):
    """Kinetics classification head: 1x1x1 conv -> BN/ReLU -> global avg pool
    -> 1x1x1 conv -> ReLU -> dropout -> Linear(2048->400) -> global average
    (ref: /root/reference/model/x3d.py:415-540). Kept for checkpoint parity /
    video-classification use; not on any Change3D task path."""

    cfg: X3DConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        cfg = self.cfg
        dim_in, dim_inner = cfg.stage_dims[-1], cfg.stage_inner_dims[-1]
        pre = self.param("pre_conv", torch_conv_kernel_init, (dim_in, dim_inner))
        x = pointwise_conv3d(x, pre)
        x = BatchNorm(momentum=cfg.bn_momentum, eps=cfg.bn_eps, name="pre_bn")(
            x, use_running_average=not train
        )
        x = jax.nn.relu(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True).astype(x.dtype)
        post = self.param("post_conv", torch_conv_kernel_init, (dim_inner, cfg.head_dim_out))
        x = jax.nn.relu(pointwise_conv3d(x, post))
        if train and cfg.dropout_rate > 0:
            x = nn.Dropout(cfg.dropout_rate, deterministic=False)(x)
        w = self.param("proj_w", torch_conv_kernel_init, (cfg.head_dim_out, cfg.num_classes))
        b = self.param("proj_b", nn.initializers.zeros, (cfg.num_classes,))
        x = linear(x, w, b)
        return jnp.mean(x, axis=(1, 2, 3))  # [B, num_classes]


class X3D(nn.Module):
    """The full backbone with per-block access for Change3D feature taps.

    ``__call__(x, num_blocks, train)`` runs stem + the first ``num_blocks-1``
    stages and returns the per-block outputs (the Encoder applies enhancement
    between blocks itself via ``run_block``).
    """

    cfg: X3DConfig = field(default_factory=x3d_l_config)

    def setup(self):
        self.stem = X3DStem(self.cfg)
        dims_in = (self.cfg.stem_dim_out,) + self.cfg.stage_dims[:-1]
        self.stages = [
            X3DStage(self.cfg, i, dims_in[i], name=f"stage{i + 1}") for i in range(4)
        ]
        self.head = X3DHead(self.cfg)

    def run_block(
        self,
        i: int,
        x: jax.Array,
        *,
        train: bool,
        packed_in: int = 0,
        keep_packed: bool = False,
    ) -> jax.Array:
        """Block i of [stem, stage1..stage4] — mirrors x3d.blocks[i]
        (ref: /root/reference/model/trainer.py:127-139). ``packed_in`` /
        ``keep_packed`` carry the time-packed layout across block boundaries
        (see block_runs_packed)."""
        if i == 0:
            return self.stem(x, train=train, keep_packed=keep_packed)
        return self.stages[i - 1](
            x, train=train, packed_in=packed_in, keep_packed=keep_packed
        )

    def __call__(self, x: jax.Array, *, train: bool = False, classify: bool = False):
        for i in range(5):
            x = self.run_block(i, x, train=train)
        if classify:
            return self.head(x, train=train)
        return x
