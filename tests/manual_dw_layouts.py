"""Depthwise-3D-conv layout experiments at real X3D shapes (TPU, serial chain).

The eval path is VPU/HBM-bound on the depthwise 3x3x3 convs; with NDHWC the
channel axis sits in the 128-wide lane dimension, so C in {24, 54, 108} wastes
2.4-5.3x of every vector op and HBM tile. Hypothesis (ROADMAP "W-in-lanes
tiling"): putting W in lanes ([B,T,H,C,W]) and expressing the depthwise conv
as a 27-tap shift-multiply-accumulate recovers full lane occupancy for
C-small stages.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tests/manual_dw_layouts.py
"""

import time

import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.ops.layers import depthwise_conv3d, pointwise_conv3d

B = 64
DTYPE = jnp.bfloat16
N = 10


def timed(name, fn, *args):
    def chained(*args):
        x = args[0]

        def body(carry, _):
            out = fn(carry, *args[1:])
            bump = (jnp.sum(out) * 1e-12).astype(carry.dtype)
            return carry + bump, ()

        final, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(final)

    run = jax.jit(chained)
    float(run(*args))  # compile+warm
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / N
    print(f"  {name:42s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def rnd(*shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, DTYPE)


# --- depthwise variants ----------------------------------------------------


def dw_cminor_lax(x, k5):
    """Current implementation. x: [B,T,H,W,C], k5: [3,3,3,1,C]."""
    return depthwise_conv3d(x, k5, padding=(1, 1, 1))


def dw_cminor_shifts(x, k):
    """27-tap shift-MAC in the same C-minor layout. k: [3,3,3,C]."""
    t, h, w = x.shape[1], x.shape[2], x.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = None
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                term = xp[:, dt : dt + t, dh : dh + h, dw : dw + w, :] * k[dt, dh, dw]
                y = term if y is None else y + term
    return y


def dw_wminor_shifts(x, k):
    """27-tap shift-MAC with W in lanes. x: [B,T,H,C,W], k: [3,3,3,C]."""
    t, h, w = x.shape[1], x.shape[2], x.shape[4]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (1, 1)))
    y = None
    for dt in range(3):
        for dh in range(3):
            for dw_ in range(3):
                term = (
                    xp[:, dt : dt + t, dh : dh + h, :, dw_ : dw_ + w]
                    * k[dt, dh, dw_][:, None]
                )
                y = term if y is None else y + term
    return y


def to_wminor(x):
    return jnp.transpose(x, (0, 1, 2, 4, 3))


def pw_cminor(x, kmat):
    return pointwise_conv3d(x, kmat)


def pw_wminor(x, kmat):
    """x: [B,T,H,C,W] @ kmat [C,Co] -> [B,T,H,Co,W] via einsum."""
    return jnp.einsum(
        "bthcw,cd->bthdw", x, kmat.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def roundtrip(x, _):
    return jnp.transpose(to_wminor(x), (0, 1, 2, 4, 3))


CASES = [
    ("stage1 inner (T3 128^2 C54)", 3, 128, 54),
    ("stage2 inner (T3 64^2 C108)", 3, 64, 108),
    ("stage3 inner (T3 32^2 C216)", 3, 32, 216),
]


def main():
    print(f"batch {B}, {DTYPE.__name__}, {N}-op serial chains")
    for name, t, hw, c in CASES:
        print(name)
        x = rnd(B, t, hw, hw, c)
        k5 = rnd(3, 3, 3, 1, c, seed=1) * 0.1
        k4 = k5[:, :, :, 0, :]
        xw = to_wminor(x)
        kmat = rnd(c, c, seed=2) * 0.1
        d0 = timed("dw lax conv (C minor, current)", dw_cminor_lax, x, k5)
        d1 = timed("dw 27-shift MAC (C minor)", dw_cminor_shifts, x, k4)
        d2 = timed("dw 27-shift MAC (W minor)", dw_wminor_shifts, xw, k4)
        timed("transpose C<->W roundtrip", roundtrip, x, None)
        p0 = timed("pointwise CxC matmul (C minor)", pw_cminor, x, kmat)
        p1 = timed("pointwise CxC einsum (W minor)", pw_wminor, xw, kmat)
        print(
            f"  -> dw speedup W-minor vs current: {d0 / d2:.2f}x; "
            f"pointwise W/C: {p0 / p1:.2f}x"
        )


if __name__ == "__main__":
    main()
