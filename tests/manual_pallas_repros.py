"""Minimal repros for the two Pallas/Mosaic failures seen on this relay's
remote-compile service (run on TPU: python tests/manual_pallas_repros.py).

1. ``dot_1d``: a 1-D x 2-D jnp.dot inside a Pallas kernel makes Mosaic emit a
   ``#tpu.dot_dimension_numbers`` attribute its own parser rejects
   ("expected integer value ... lhs_non_contracting_dims"). Reshaping the
   vector operand to [1, C] (strict 2-D matmul) lowers fine — the fused
   block's SE kernel uses that workaround (ops/pallas/fused_block.py).
   Status round 3: REPRODUCES (worked around in-tree).

2. ``manual_dma``: a kernel whose input stays in ANY/HBM memory space and is
   brought into VMEM with ``pltpu.make_async_copy`` kills the remote compile
   helper outright (HTTP 500, subprocess exit 1) — this is what keeps
   ``fused_bottleneck_block_htiled`` gated off here; the neighbor-block
   BlockSpec variant (``fused_bottleneck_block_jtiled``) avoids manual DMA
   entirely and compiles. Status round 3: REPRODUCES.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def repro_dot_1d():
    def kernel(x_ref, w_ref, o_ref):
        s = jnp.mean(x_ref[:], axis=0)  # [C] -- 1-D lhs triggers the bug
        o_ref[:] = (
            jnp.dot(s, w_ref[:], preferred_element_type=jnp.float32)[None]
            + jnp.zeros_like(x_ref[:], jnp.float32)
        ).astype(x_ref.dtype)

    x = jax.random.normal(jax.random.PRNGKey(0), (256, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 128), jnp.bfloat16)
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.bfloat16))(x, w)
    out.block_until_ready()


def repro_manual_dma():
    def kernel(x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[b], scratch, sem)
        cp.start()
        cp.wait()
        o_ref[0] = scratch[:] * 2.0

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 128, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 128, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32), pltpu.SemaphoreType.DMA(())],
    )(x)
    out.block_until_ready()


if __name__ == "__main__":
    for name, fn in (("dot_1d", repro_dot_1d), ("manual_dma", repro_manual_dma)):
        try:
            fn()
            print(f"{name}: OK (bug not present on this stack)")
        except Exception as e:
            print(f"{name}: FAIL {str(e).splitlines()[0][:120]}")
