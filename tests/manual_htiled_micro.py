"""Manual (TPU) check + micro-timing of the H-tiled fused bottleneck kernels
at the real X3D-L stage-1/2 shapes (the only stages the 6 MB VMEM budget
excludes from the full fused kernel).

Round-5 context: the relay's remote-compile service historically crashed on
manual-DMA Pallas kernels (tests/manual_pallas_repros.py `manual_dma`), which
kept `fused_bottleneck_block_htiled` unmeasured. The repro now passes, so this
script (a) equality-checks htiled on-chip vs the XLA composition, then
(b) times XLA vs jtiled vs htiled per stage shape — feeding the verdict-item-8
measure-or-reject decision.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tests/manual_htiled_micro.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from change3d_tpu.ops.layers import (
    depthwise_conv3d,
    pointwise_conv3d,
    squeeze_excite_3d,
    swish,
)
from change3d_tpu.ops.pallas.fused_block import (
    fused_bottleneck_block_htiled,
    fused_bottleneck_block_jtiled,
)
from change3d_tpu.utils.cache import enable_compilation_cache

# (name, B, T, H, W, C, Ci, SE reduced dim or 0). Stage dims from
# models/x3d.py x3d_l_config: stage1 24/54 @128^2, stage2 48/108 @64^2.
# B=32 keeps compiles fast; the full-model bench (bench.py ... htiled) is the
# production-batch ground truth.
SHAPES = [
    ("stage1_se", 32, 3, 128, 128, 24, 54, 8),
    ("stage1_nose", 32, 3, 128, 128, 24, 54, 0),
    ("stage2_se", 32, 3, 64, 64, 48, 108, 8),
    ("stage2_nose", 32, 3, 64, 64, 48, 108, 0),
]


def composition(x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se):
    xa = jax.nn.relu(pointwise_conv3d(x, w_a) * a_a + b_a)
    xd = depthwise_conv3d(xa, w_dw[..., None, :].reshape(3, 3, 3, 1, -1))
    xb = xd * a_b + b_b
    if se is not None:
        xb = squeeze_excite_3d(xb, *se)
    xs = swish(xb)
    xc = pointwise_conv3d(xs, w_c) * a_c + b_c
    return jax.nn.relu(xc + x)


def time_fn(fn, *args):
    """best-of-3 VALUE-FETCH timing: block_until_ready is not a reliable
    fence through this relay (ARCHITECTURE.md 'Training throughput'); only
    fetching a scalar forces completion. The sum rides on the same dispatch."""
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args).astype(jnp.float32)))
        dt = min(dt, time.perf_counter() - t0)
    return out, dt * 1e3


def main():
    enable_compilation_cache()
    h_tile = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    for name, b, t, h, w, c, ci, cr in SHAPES:
        rng = np.random.RandomState(0)
        f32 = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
        x = f32(b, t, h, w, c).astype(jnp.bfloat16)
        w_a, a_a, b_a = f32(c, ci), f32(ci) * 0.1 + 1.0, f32(ci) * 0.1
        w_dw = f32(3, 3, 3, ci)
        a_b, b_b = f32(ci) * 0.1 + 1.0, f32(ci) * 0.1
        w_c, a_c, b_c = f32(ci, c), f32(c) * 0.1 + 1.0, f32(c) * 0.1
        se = (f32(ci, cr), f32(cr), f32(cr, ci), f32(ci)) if cr else None
        args = (x, w_a, a_a, b_a, w_dw, a_b, b_b, w_c, a_c, b_c, se)

        ref, ms_xla = time_fn(jax.jit(composition), *args)
        rows = {"h_tile": h_tile, "xla_ms": round(ms_xla, 2)}
        for label, fn in (
            ("jtiled", fused_bottleneck_block_jtiled),
            ("htiled", fused_bottleneck_block_htiled),
        ):
            try:
                got, ms = time_fn(jax.jit(lambda *a: fn(*a, h_tile=h_tile)), *args)
                err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
                scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
                rows[f"{label}_ms"] = round(ms, 2)
                rows[f"{label}_relerr"] = round(err / scale, 5)
            except Exception as e:
                rows[f"{label}_ms"] = None
                rows[f"{label}_error"] = str(e).splitlines()[0][:120]
        print(json.dumps({"shape": name, **rows}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
