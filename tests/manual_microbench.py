"""Per-op microbenchmarks at real BCD shapes, pool-proof (serial scan chain).

Each op is timed as ONE jitted lax.scan of N chained applications (the
carry's bump makes every iteration data-dependent on the previous), so the
relay cannot parallelize or dedup dispatches. Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tests/manual_microbench.py
"""

import time

import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.ops.layers import conv3d, depthwise_conv3d, pointwise_conv3d

B, T = 64, 3
DTYPE = jnp.bfloat16
N = 10


def timed(name, op, x, w):
    def chained(x, w):
        def body(carry, _):
            out = op(carry, w)
            bump = (jnp.sum(out) * 1e-12).astype(carry.dtype)
            return carry + bump * jnp.zeros_like(carry) + bump, ()

        # note: carry shape must equal input shape; ops that change shape get
        # the bump folded back onto the original input instead.
        final, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(final)

    run = jax.jit(chained)
    float(run(x, w))  # compile+warm
    t0 = time.perf_counter()
    float(run(x, w))
    dt = (time.perf_counter() - t0) / N
    print(f"{name:46s} {dt * 1e3:8.3f} ms  ({dt / B * 1e6:7.1f} us/sample)", flush=True)
    return dt


def rnd(*shape):
    return jax.random.normal(jax.random.PRNGKey(0), shape, DTYPE)


def main():
    total = 0.0
    total += timed("stem spatial 1x3x3 3->24 @256", lambda x, w: conv3d(x, w, padding=(0, 1, 1)), rnd(B, T, 256, 256, 3), rnd(1, 3, 3, 3, 24))
    total += timed("stem temporal dw 5x1x1 c24 @256", lambda x, w: depthwise_conv3d(x, w, padding=(2, 0, 0)), rnd(B, T, 256, 256, 24), rnd(5, 1, 1, 1, 24))

    stages = [
        (24, 54, 24, 256, 128, 5),
        (24, 108, 48, 128, 64, 10),
        (48, 216, 96, 64, 32, 25),
        (96, 432, 192, 32, 16, 15),
    ]
    for si, (c_in, c_inner, c_out, h_in, h_out, depth) in enumerate(stages):
        t_a = timed(f"s{si+1} conv_a {c_out}->{c_inner} @{h_out}", lambda x, w: pointwise_conv3d(x, w), rnd(B, T, h_out, h_out, c_out), rnd(c_out, c_inner))
        t_dw = timed(f"s{si+1} dw 3x3x3 c{c_inner} @{h_out}", lambda x, w: depthwise_conv3d(x, w), rnd(B, T, h_out, h_out, c_inner), rnd(3, 3, 3, 1, c_inner))
        t_c = timed(f"s{si+1} conv_c {c_inner}->{c_out} @{h_out}", lambda x, w: pointwise_conv3d(x, w), rnd(B, T, h_out, h_out, c_inner), rnd(c_inner, c_out))
        total += depth * (t_a + t_dw + t_c)

    print(f"\nrough model estimate: {total * 1e3:.1f} ms / batch {B} "
          f"({total / B * 1e6:.0f} us/sample, ~{B / total:.0f} pairs/s)")


if __name__ == "__main__":
    main()
