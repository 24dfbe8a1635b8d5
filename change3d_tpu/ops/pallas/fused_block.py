"""Pallas TPU kernel: fused X3D bottleneck res-block (inference).

One X3D bottleneck block in XLA is ~6 full-tensor HBM passes
(conv_a, BN+ReLU, depthwise 3x3x3, BN(+SE), swish, conv_c, BN, residual;
see ARCHITECTURE.md "Where the time goes"). For stride-1 blocks whose inner
tensor fits VMEM (stages 3-4: 32^2 x 216ch, 16^2 x 432ch), this kernel runs
the whole block per batch element inside VMEM:

  HBM traffic = read x once + write out once (+ tiny weights)

Math (eval-mode, BN folded to per-channel scale/shift a,b):
  xa = relu(dot(x, Wa) * a_a + b_a)             # MXU [THW,Cin]x[Cin,Ci]
  xd = depthwise3x3x3(xa)                       # 27 shifted VPU FMAs
  xb = xd * a_b + b_b
  g  = sigmoid(relu(mean_thw(xb) @ Wse1 + bse1) @ Wse2 + bse2)   # optional
  xs = swish(xb * g)
  y  = relu(dot(xs, Wc) * a_c + b_c + x)        # residual (Cin == Cout)

Semantics identical to X3DBottleneck/X3DResBlock with use_running_average
(verified in tests against the XLA composition). Inference-only: no VJP —
training keeps the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wa_ref, aa_ref, ba_ref, wdw_ref, ab_ref, bb_ref,
            wse1_ref, bse1_ref, wse2_ref, bse2_ref, wc_ref, ac_ref, bc_ref,
            out_ref, *, has_se: bool):
    x = x_ref[0]  # [T, H, W, Cin] bf16
    t, h, w, c_in = x.shape
    c_inner = wa_ref.shape[1]
    thw = t * h * w

    # conv_a (MXU) + BN + ReLU
    xa = jnp.dot(x.reshape(thw, c_in), wa_ref[:], preferred_element_type=jnp.float32)
    xa = jnp.maximum(xa * aa_ref[:] + ba_ref[:], 0.0).astype(x.dtype)
    xa = xa.reshape(t, h, w, c_inner)

    # depthwise 3x3x3: 27 shifted FMAs over a zero-padded copy (VPU)
    xp = jnp.pad(xa, ((1, 1), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((t, h, w, c_inner), jnp.float32)
    for dt in range(3):
        for dy in range(3):
            for dx in range(3):
                tap = wdw_ref[dt, dy, dx]  # [Ci]
                acc += xp[dt : dt + t, dy : dy + h, dx : dx + w].astype(jnp.float32) * tap

    xb = acc * ab_ref[:] + bb_ref[:]  # f32 [T,H,W,Ci]

    if has_se:
        # [1, Ci] not [Ci]: Mosaic's lowering of 1-D x 2-D dots emits an
        # unparseable tpu.dot_dimension_numbers attribute on this stack
        # (repro: tests/manual_pallas_repros.py); strict 2-D matmuls lower
        # fine and are numerically identical.
        s = jnp.mean(xb, axis=(0, 1, 2))[None]  # [1, Ci]
        g1 = jnp.maximum(jnp.dot(s, wse1_ref[:], preferred_element_type=jnp.float32) + bse1_ref[:], 0.0)
        gate = jax.nn.sigmoid(jnp.dot(g1, wse2_ref[:], preferred_element_type=jnp.float32) + bse2_ref[:])
        xb = xb * gate[0]

    xs = (xb * jax.nn.sigmoid(xb)).astype(x.dtype)  # swish

    # conv_c (MXU) + BN + residual + ReLU
    xc = jnp.dot(xs.reshape(thw, c_inner), wc_ref[:], preferred_element_type=jnp.float32)
    xc = xc * ac_ref[:] + bc_ref[:]
    y = jnp.maximum(xc.reshape(t, h, w, c_in) + x.astype(jnp.float32), 0.0)
    out_ref[0] = y.astype(x.dtype)


def _halo_body(x_hbm, wa_ref, aa_ref, ba_ref, wdw_ref, ab_ref, bb_ref,
               scratch, sem, h_tile: int):
    """Shared phase: DMA an H-halo tile of x into VMEM (manual, clamped at
    the image edges), then compute through conv_a+BN+ReLU and the depthwise
    3x3x3 + BN. Returns (x_core [T,h,W,Cin] f-sliceable, xb [T,h,W,Ci] f32).
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    t_dim, h_full, w_dim, c_in = x_hbm.shape[1], x_hbm.shape[2], x_hbm.shape[3], x_hbm.shape[4]

    # Desired logical rows: [j*h_tile - 1, j*h_tile + h_tile + 1). The DMA
    # start is clamped into the image; edge tiles come back shifted by one
    # row, fixed below with an in-VMEM shift + zero halo (needs n_j >= 2).
    start = jnp.maximum(j * h_tile - 1, 0)
    start = jnp.minimum(start, h_full - (h_tile + 2))
    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(start, h_tile + 2)], scratch, sem
    )
    cp.start()
    cp.wait()

    raw = scratch[:]  # [T, h_tile+2, W, Cin]
    zero_row = jnp.zeros_like(raw[:, :1])
    shifted_down = jnp.concatenate([zero_row, raw[:, : h_tile + 1]], axis=1)  # j == 0
    shifted_up = jnp.concatenate([raw[:, 1:], zero_row], axis=1)  # j == n_j-1
    is_first = (j == 0)
    is_last = (j == n_j - 1)
    x = jnp.where(is_first, shifted_down, jnp.where(is_last, shifted_up, raw))
    hh = h_tile + 2
    c_inner = wa_ref.shape[1]
    xa = jnp.dot(x.reshape(t_dim * hh * w_dim, c_in), wa_ref[:], preferred_element_type=jnp.float32)
    xa = jnp.maximum(xa * aa_ref[:] + ba_ref[:], 0.0).astype(x.dtype)
    xa = xa.reshape(t_dim, hh, w_dim, c_inner)
    # The depthwise conv zero-pads in xa-space (post conv_a/BN/ReLU), so the
    # out-of-image halo rows must be zero *here*, not in x-space (conv_a+BN
    # maps zeros to relu(b_a) != 0).
    row = jax.lax.broadcasted_iota(jnp.int32, (1, hh, 1, 1), 1)
    halo_oob = (is_first & (row == 0)) | (is_last & (row == hh - 1))
    xa = jnp.where(halo_oob, 0.0, xa).astype(x.dtype)
    # pad T (zero-pad conv semantics) and W (image edge) inside VMEM
    xp = jnp.pad(xa, ((1, 1), (0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((t_dim, h_tile, w_dim, c_inner), jnp.float32)
    for dt in range(3):
        for dy in range(3):
            for dx in range(3):
                tap = wdw_ref[dt, dy, dx]
                acc += xp[dt : dt + t_dim, dy : dy + h_tile, dx : dx + w_dim].astype(jnp.float32) * tap
    xb = acc * ab_ref[:] + bb_ref[:]
    return x, xb


def _kernel_htiled(x_hbm, wa_ref, aa_ref, ba_ref, wdw_ref, ab_ref, bb_ref,
                   gate_ref, wc_ref, ac_ref, bc_ref, out_ref, scratch, sem,
                   *, h_tile: int, has_se: bool):
    """H-tiled fused block for big early stages. x stays in HBM (ANY) and is
    halo-DMA'd per tile; SE gates (global reduction) are precomputed per
    batch element (two-phase) and passed via gate_ref [B, Ci]."""
    b = pl.program_id(0)
    x, xb = _halo_body(x_hbm, wa_ref, aa_ref, ba_ref, wdw_ref, ab_ref, bb_ref,
                       scratch, sem, h_tile)
    t_dim, _, w_dim, c_in = x.shape
    c_inner = xb.shape[-1]
    if has_se:
        xb = xb * gate_ref[b]
    xs = (xb * jax.nn.sigmoid(xb)).astype(x.dtype)
    xc = jnp.dot(xs.reshape(t_dim * h_tile * w_dim, c_inner), wc_ref[:], preferred_element_type=jnp.float32)
    xc = (xc * ac_ref[:] + bc_ref[:]).reshape(t_dim, h_tile, w_dim, c_in)
    res = x[:, 1 : 1 + h_tile].astype(jnp.float32)
    out_ref[0] = jnp.maximum(xc + res, 0.0).astype(x.dtype)


def _kernel_se_sums(x_hbm, wa_ref, aa_ref, ba_ref, wdw_ref, ab_ref, bb_ref,
                    out_ref, scratch, sem, *, h_tile: int):
    """Phase 1 of SE for H-tiled blocks: per-(batch, tile) sum of xb,
    written into an (8, 128)-aligned tile (row 0, first Ci lanes)."""
    _, xb = _halo_body(x_hbm, wa_ref, aa_ref, ba_ref, wdw_ref, ab_ref, bb_ref,
                       scratch, sem, h_tile)
    c_inner = xb.shape[-1]
    s = jnp.sum(xb.reshape(-1, c_inner), axis=0, keepdims=True)  # [1, Ci]
    lanes = out_ref.shape[-1]
    s_pad = jnp.pad(s, ((0, 0), (0, lanes - c_inner)))
    out_ref[0, 0] = jnp.broadcast_to(s_pad, (out_ref.shape[-2], lanes))


def fused_bottleneck_block_htiled(
    x: jax.Array,
    w_a: jax.Array, a_a: jax.Array, b_a: jax.Array,
    w_dw: jax.Array, a_b: jax.Array, b_b: jax.Array,
    w_c: jax.Array, a_c: jax.Array, b_c: jax.Array,
    se: Optional[tuple] = None,
    *,
    h_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """H-tiled fused block for stages whose inner tensor exceeds VMEM
    (stage 1/2 at 128^2/64^2). x stays in HBM; each grid cell halo-DMAs
    [T, h_tile+2, W, C]. SE runs two-phase (partial sums -> gate -> apply),
    re-running the cheap front half instead of materializing the inner
    tensor in HBM."""
    b_dim, t, h, w, c = x.shape
    assert h % h_tile == 0 and h // h_tile >= 2, (h, h_tile)
    c_inner = w_a.shape[1]
    n_j = h // h_tile
    interpret = interpret or jax.default_backend() == "cpu"

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    front_args = (
        x,
        w_a.astype(x.dtype), a_a.astype(jnp.float32), b_a.astype(jnp.float32),
        w_dw.astype(jnp.float32), a_b.astype(jnp.float32), b_b.astype(jnp.float32),
    )
    front_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [vmem()] * 6
    scratch_shapes = [
        pltpu.VMEM((t, h_tile + 2, w, c), x.dtype),
        pltpu.SemaphoreType.DMA(()),
    ]

    if se is not None:
        w1, b1, w2, b2 = se
        lanes = max(128, -(-c_inner // 128) * 128)
        sums = pl.pallas_call(
            functools.partial(_kernel_se_sums, h_tile=h_tile),
            grid=(b_dim, n_j),
            in_specs=front_specs,
            out_specs=pl.BlockSpec(
                (1, 1, 8, lanes), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b_dim, n_j, 8, lanes), jnp.float32),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*front_args)
        mean = jnp.sum(sums[:, :, 0, :c_inner], axis=1) / (t * h * w)  # [B, Ci]
        g1 = jnp.maximum(mean @ w1.astype(jnp.float32) + b1.astype(jnp.float32), 0.0)
        gate = jax.nn.sigmoid(g1 @ w2.astype(jnp.float32) + b2.astype(jnp.float32))
    else:
        gate = jnp.ones((b_dim, c_inner), jnp.float32)

    return pl.pallas_call(
        functools.partial(_kernel_htiled, h_tile=h_tile, has_se=se is not None),
        grid=(b_dim, n_j),
        in_specs=front_specs + [vmem(), vmem(), vmem(), vmem()],
        out_specs=pl.BlockSpec(
            (1, t, h_tile, w, c), lambda b, j: (b, 0, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_dim * t * h * w * c_inner * (2 * c + 27),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b_dim * t * h * w * c_inner,
        ),
        interpret=interpret,
    )(
        *front_args,
        gate,
        w_c.astype(x.dtype), a_c.astype(jnp.float32), b_c.astype(jnp.float32),
    )


def _jtile_front(xm_ref, x_ref, xp_ref, wa_ref, aa_ref, ba_ref,
                 wdw_ref, ab_ref, bb_ref):
    """Shared front half of the neighbor-halo tiled kernel: assemble an
    H-halo tile from the previous/current/next grid blocks (no manual DMA —
    the halo rows ride in via clamped BlockSpec index maps), then run
    conv_a + BN + ReLU and the depthwise 3x3x3 + BN.

    Returns (x_core [T,h,W,Cin], xb [T,h,W,Ci] f32).
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    x_core = x_ref[0]  # [T, h, W, Cin]
    t_dim, h_tile, w_dim, c_in = x_core.shape
    # Halo rows: last row of block j-1, first row of block j+1. At the image
    # edges the clamped index maps alias the current block — wrong rows, but
    # they are zeroed in xa-space below (the depthwise conv zero-pads AFTER
    # conv_a/BN/ReLU, which maps zeros to relu(b_a) != 0, so x-space zeroing
    # would be wrong anyway).
    x = jnp.concatenate([xm_ref[0][:, -1:], x_core, xp_ref[0][:, :1]], axis=1)
    hh = h_tile + 2
    c_inner = wa_ref.shape[1]
    xa = jnp.dot(x.reshape(t_dim * hh * w_dim, c_in), wa_ref[:], preferred_element_type=jnp.float32)
    xa = jnp.maximum(xa * aa_ref[:] + ba_ref[:], 0.0).astype(x.dtype)
    xa = xa.reshape(t_dim, hh, w_dim, c_inner)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, hh, 1, 1), 1)
    halo_oob = ((j == 0) & (row == 0)) | ((j == n_j - 1) & (row == hh - 1))
    xa = jnp.where(halo_oob, 0.0, xa).astype(x.dtype)
    xp = jnp.pad(xa, ((1, 1), (0, 0), (1, 1), (0, 0)))  # pad T + W in VMEM
    acc = jnp.zeros((t_dim, h_tile, w_dim, c_inner), jnp.float32)
    for dt in range(3):
        for dy in range(3):
            for dx in range(3):
                tap = wdw_ref[dt, dy, dx]
                acc += xp[dt : dt + t_dim, dy : dy + h_tile, dx : dx + w_dim].astype(jnp.float32) * tap
    xb = acc * ab_ref[:] + bb_ref[:]
    return x_core, xb


def _kernel_jtiled(xm_ref, x_ref, xp_ref, wa_ref, aa_ref, ba_ref,
                   wdw_ref, ab_ref, bb_ref, gate_ref, wc_ref, ac_ref, bc_ref,
                   out_ref, *, has_se: bool):
    b = pl.program_id(0)
    x_core, xb = _jtile_front(xm_ref, x_ref, xp_ref, wa_ref, aa_ref, ba_ref,
                              wdw_ref, ab_ref, bb_ref)
    t_dim, h_tile, w_dim, c_in = x_core.shape
    c_inner = xb.shape[-1]
    if has_se:
        xb = xb * gate_ref[b]
    xs = (xb * jax.nn.sigmoid(xb)).astype(x_core.dtype)
    xc = jnp.dot(xs.reshape(t_dim * h_tile * w_dim, c_inner), wc_ref[:], preferred_element_type=jnp.float32)
    xc = (xc * ac_ref[:] + bc_ref[:]).reshape(t_dim, h_tile, w_dim, c_in)
    out_ref[0] = jnp.maximum(xc + x_core.astype(jnp.float32), 0.0).astype(x_core.dtype)


def _kernel_jtiled_se_sums(xm_ref, x_ref, xp_ref, wa_ref, aa_ref, ba_ref,
                           wdw_ref, ab_ref, bb_ref, out_ref):
    """SE phase 1: per-(batch, tile) sum of xb into an (8, lanes) tile."""
    _, xb = _jtile_front(xm_ref, x_ref, xp_ref, wa_ref, aa_ref, ba_ref,
                         wdw_ref, ab_ref, bb_ref)
    c_inner = xb.shape[-1]
    s = jnp.sum(xb.reshape(-1, c_inner), axis=0, keepdims=True)  # [1, Ci]
    lanes = out_ref.shape[-1]
    s_pad = jnp.pad(s, ((0, 0), (0, lanes - c_inner)))
    out_ref[0, 0] = jnp.broadcast_to(s_pad, (out_ref.shape[-2], lanes))


def fused_bottleneck_block_jtiled(
    x: jax.Array,
    w_a: jax.Array, a_a: jax.Array, b_a: jax.Array,
    w_dw: jax.Array, a_b: jax.Array, b_b: jax.Array,
    w_c: jax.Array, a_c: jax.Array, b_c: jax.Array,
    se: Optional[tuple] = None,
    *,
    h_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """H-tiled fused block for stages whose inner tensor exceeds VMEM
    (stage 1/2 at 128^2/64^2) WITHOUT manual DMAs: each grid cell reads its
    own H tile plus the previous/next tiles through three clamped BlockSpecs
    and assembles the one-row halos in VMEM. Costs one extra HBM read of x
    (C_in is the small pre-expansion width) but stays on the automatically
    pipelined Pallas path, which this environment's compile service accepts
    (the make_async_copy variant, fused_bottleneck_block_htiled, crashes it —
    kept for standard TPU stacks).

    SE blocks run two-phase: a partial-sum kernel over the same front half,
    the tiny gate matmuls in XLA, then the main kernel applies gate_ref.
    """
    b_dim, t, h, w, c = x.shape
    assert h % h_tile == 0 and h // h_tile >= 2, (h, h_tile)
    c_inner = w_a.shape[1]
    n_j = h // h_tile
    interpret = interpret or jax.default_backend() == "cpu"

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = (1, t, h_tile, w, c)
    x_specs = [
        pl.BlockSpec(tile, lambda b, j: (b, 0, jnp.maximum(j - 1, 0), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tile, lambda b, j: (b, 0, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tile, lambda b, j, n=n_j: (b, 0, jnp.minimum(j + 1, n - 1), 0, 0), memory_space=pltpu.VMEM),
    ]
    front_args = (
        x, x, x,
        w_a.astype(x.dtype), a_a.astype(jnp.float32), b_a.astype(jnp.float32),
        w_dw.astype(jnp.float32), a_b.astype(jnp.float32), b_b.astype(jnp.float32),
    )
    front_specs = x_specs + [vmem()] * 6

    if se is not None:
        w1, b1, w2, b2 = se
        lanes = max(128, -(-c_inner // 128) * 128)
        sums = pl.pallas_call(
            _kernel_jtiled_se_sums,
            grid=(b_dim, n_j),
            in_specs=front_specs,
            out_specs=pl.BlockSpec(
                (1, 1, 8, lanes), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b_dim, n_j, 8, lanes), jnp.float32),
            interpret=interpret,
        )(*front_args)
        mean = jnp.sum(sums[:, :, 0, :c_inner], axis=1) / (t * h * w)  # [B, Ci]
        g1 = jnp.maximum(mean @ w1.astype(jnp.float32) + b1.astype(jnp.float32), 0.0)
        gate = jax.nn.sigmoid(g1 @ w2.astype(jnp.float32) + b2.astype(jnp.float32))
    else:
        gate = jnp.ones((b_dim, c_inner), jnp.float32)

    return pl.pallas_call(
        functools.partial(_kernel_jtiled, has_se=se is not None),
        grid=(b_dim, n_j),
        in_specs=front_specs + [vmem(), vmem(), vmem(), vmem()],
        out_specs=pl.BlockSpec(tile, lambda b, j: (b, 0, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_dim * t * h * w * c_inner * (2 * c + 27),
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=b_dim * t * h * w * c_inner,
        ),
        interpret=interpret,
    )(
        *front_args,
        gate,
        w_c.astype(x.dtype), a_c.astype(jnp.float32), b_c.astype(jnp.float32),
    )


def fused_bottleneck_block(
    x: jax.Array,
    w_a: jax.Array, a_a: jax.Array, b_a: jax.Array,
    w_dw: jax.Array, a_b: jax.Array, b_b: jax.Array,
    w_c: jax.Array, a_c: jax.Array, b_c: jax.Array,
    se: Optional[tuple] = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """x: [B,T,H,W,C]; w_a: [C,Ci]; w_dw: [3,3,3,Ci]; w_c: [Ci,C];
    a_*/b_* folded BN vectors (f32); se: (w1 [Ci,Cr], b1, w2 [Cr,Ci], b2).

    Stride-1, dim-preserving blocks only (every non-first block of a stage).
    """
    b, t, h, w, c = x.shape
    c_inner = w_a.shape[1]
    has_se = se is not None
    # Mosaic targets TPU; on CPU (tests, virtual meshes) run interpreted.
    interpret = interpret or jax.default_backend() == "cpu"
    if not has_se:
        # dummy SE operands keep one kernel signature
        se = (
            jnp.zeros((c_inner, 8), jnp.float32), jnp.zeros((8,), jnp.float32),
            jnp.zeros((8, c_inner), jnp.float32), jnp.zeros((c_inner,), jnp.float32),
        )
    wse1, bse1, wse2, bse2 = se

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, has_se=has_se)
    flops = 2 * b * t * h * w * c_inner * (2 * c + 27)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            full(), full(), full(), full(), full(), full(),
            full(), full(), full(), full(),
            full(), full(), full(),
        ],
        out_specs=pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize, transcendentals=x.size
        ),
        interpret=interpret,
    )(
        x,
        w_a.astype(x.dtype), a_a.astype(jnp.float32), b_a.astype(jnp.float32),
        w_dw.astype(jnp.float32), a_b.astype(jnp.float32), b_b.astype(jnp.float32),
        wse1.astype(jnp.float32), bse1.astype(jnp.float32),
        wse2.astype(jnp.float32), bse2.astype(jnp.float32),
        w_c.astype(x.dtype), a_c.astype(jnp.float32), b_c.astype(jnp.float32),
    )
