"""Experiment: time-packed layout [B, H, W, C*T] for the stem + stage-1 path.

Hypothesis: NDHWC puts C in the TPU lane dim; the early X3D stages have
C in {3, 24, 54} so every full-tensor pass wastes 2.4-5.3x of lane bandwidth.
Packing the T=3 frames into the channel axis *c-major* (feature index =
c*T + t) multiplies the lane occupancy by 3 while keeping everything
expressible in stock XLA:

- spatial convs / pointwise convs: block-diagonal-over-t dense kernels
  (T^2/T more MACs, irrelevant — we are ~2% MXU-bound);
- depthwise 3x3x3 conv: a *grouped 2D conv* with feature_group_count=C where
  each C-group maps its 3 temporal taps through a banded 3x3 temporal matrix
  (zero-padding semantics encoded as zeros in the band);
- BN/SE/swish: per-c vectors repeated T times.

This script checks numerical equivalence against the reference-parity ops
and times both variants with the serial-chain method.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.ops.layers import conv3d, depthwise_conv3d, pointwise_conv3d, swish

B, T = 32, 3
H = W = 256
DTYPE = jnp.bfloat16
C_STEM, C_IN1, C_OUT1 = 24, 54, 24


def rnd(key, *shape, scale=0.2):
    return (scale * jax.random.normal(jax.random.PRNGKey(key), shape)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Weights (shared by both implementations)
# ---------------------------------------------------------------------------
W_STEM_S = rnd(0, 1, 3, 3, 3, C_STEM)       # spatial stem conv
W_STEM_T = rnd(1, 5, 1, 1, 1, C_STEM)       # depthwise temporal 5x1x1
W_A = rnd(2, C_STEM, C_IN1)                  # conv_a
W_DW = rnd(3, 3, 3, 3, 1, C_IN1)             # depthwise 3x3x3
W_C = rnd(4, C_IN1, C_OUT1)                  # conv_c
W_PROJ = rnd(5, 1, 1, 1, C_STEM, C_OUT1)     # strided shortcut


def reference_path(x):
    """x: [B,T,H,W,3] — stem + one strided bottleneck block (no BN/SE for
    isolation; those are elementwise and layout-neutral)."""
    h = conv3d(x, W_STEM_S, stride=(1, 1, 1), padding=(0, 1, 1))
    h = depthwise_conv3d(h, W_STEM_T, padding=(2, 0, 0))
    h = jax.nn.relu(h)
    short = conv3d(h, W_PROJ, stride=(1, 2, 2), padding=(0, 0, 0))
    b = pointwise_conv3d(h, W_A)
    b = jax.nn.relu(b)
    b = depthwise_conv3d(b, W_DW, stride=(1, 2, 2), padding=(1, 1, 1))
    b = swish(b)
    b = pointwise_conv3d(b, W_C)
    return jax.nn.relu(short + b)


# ---------------------------------------------------------------------------
# Packed implementation: feature index = c*T + t
# ---------------------------------------------------------------------------

def pack(x):  # [B,T,H,W,C] -> [B,H,W,C*T]
    b, t, h, w, c = x.shape
    return x.transpose(0, 2, 3, 4, 1).reshape(b, h, w, c * t)


def unpack(x, t=T):  # [B,H,W,C*T] -> [B,T,H,W,C]
    b, h, w, ct = x.shape
    return x.reshape(b, h, w, ct // t, t).transpose(0, 4, 1, 2, 3)


def block_diag_t(w2d_or_conv, t=T):
    """Expand kernel [..., Cin, Cout] to [..., Cin*T, Cout*T], block-diagonal
    over t (same weights per frame)."""
    eye = jnp.eye(t, dtype=w2d_or_conv.dtype)
    # out[(ci,ti),(co,to)] = w[ci,co] * eye[ti,to]
    expanded = jnp.einsum("...io,tu->...itou", w2d_or_conv, eye)
    shape = expanded.shape
    return expanded.reshape(shape[:-4] + (shape[-4] * t, shape[-2] * t))


def temporal_band(w_taps, t=T):
    """w_taps: [K] per-channel temporal taps (K odd) -> banded [t_in, t_out]."""
    k = w_taps.shape[0]
    half = k // 2
    m = jnp.zeros((t, t), w_taps.dtype)
    for to in range(t):
        for ti in range(t):
            d = ti - to + half
            if 0 <= d < k:
                m = m.at[ti, to].set(w_taps[d])
    return m


def packed_dw_kernel(w_dw_np, c_dim, k=3):
    """[kt,kh,kw,1,C] depthwise-3D kernel -> grouped-2D [kh,kw,T,C*T] with the
    temporal taps as a banded matrix (zero-pad semantics)."""
    w = np.zeros((w_dw_np.shape[1], w_dw_np.shape[2], T, c_dim * T), np.float32)
    half = w_dw_np.shape[0] // 2
    for c in range(c_dim):
        for t_out in range(T):
            for t_in in range(T):
                d = t_in - t_out + half
                if 0 <= d < w_dw_np.shape[0]:
                    w[:, :, t_in, c * T + t_out] = w_dw_np[d, :, :, 0, c]
    return jnp.asarray(w)


def packed_dw_dense(w_dw_np, c_dim):
    """Same op as a DENSE [kh,kw,C*T,C*T] conv (block-diagonal over c,
    banded over t): trades T*C-fold extra MACs (MXU is idle anyway) for a
    lane-friendly dense conv instead of tiny grouped convs."""
    kh, kw = w_dw_np.shape[1], w_dw_np.shape[2]
    half = w_dw_np.shape[0] // 2
    w = np.zeros((kh, kw, c_dim * T, c_dim * T), np.float32)
    for c in range(c_dim):
        for t_out in range(T):
            for t_in in range(T):
                d = t_in - t_out + half
                if 0 <= d < w_dw_np.shape[0]:
                    w[:, :, c * T + t_in, c * T + t_out] = w_dw_np[d, :, :, 0, c]
    return jnp.asarray(w)


# Precompute packed kernels (host, once).
PK_STEM_S = block_diag_t(W_STEM_S[0])                                  # [3,3,3T,24T]
PK_STEM_T = packed_dw_kernel(np.asarray(W_STEM_T), C_STEM)             # [1,1,T,24T]
PK_PROJ = block_diag_t(W_PROJ[0, 0, 0]).reshape(1, 1, C_STEM * T, C_OUT1 * T)
PK_A = block_diag_t(W_A).reshape(1, 1, C_STEM * T, C_IN1 * T)
PK_DW = packed_dw_kernel(np.asarray(W_DW), C_IN1)                      # [3,3,T,54T]
PK_DW_DENSE = packed_dw_dense(np.asarray(W_DW), C_IN1)                 # [3,3,54T,54T]
PK_STEM_T_DENSE = packed_dw_dense(np.asarray(W_STEM_T), C_STEM)        # [1,1,24T,24T]
PK_C = block_diag_t(W_C).reshape(1, 1, C_IN1 * T, C_OUT1 * T)

_DN2D = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv2d_p(x, w, stride=1, padding=0, groups=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((padding, padding),) * 2,
        dimension_numbers=_DN2D, feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def packed_path(xp):
    """xp: [B,H,W,3*T] packed input."""
    h = conv2d_p(xp, PK_STEM_S, padding=1)
    h = conv2d_p(h, PK_STEM_T, groups=C_STEM)
    h = jax.nn.relu(h)
    short = conv2d_p(h, PK_PROJ, stride=2)
    b = conv2d_p(h, PK_A)
    b = jax.nn.relu(b)
    b = conv2d_p(b, PK_DW, stride=2, padding=1, groups=C_IN1)
    b = swish(b)
    b = conv2d_p(b, PK_C)
    return jax.nn.relu(short + b)


def timed(name, fn, x, n=8):
    def chained(x):
        def body(carry, _):
            out = fn(carry)
            bump = (jnp.sum(out) * 1e-12).astype(carry.dtype)
            return carry + bump, ()

        final, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(final)

    run = jax.jit(chained)
    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt * 1e3:8.2f} ms/iter ({dt / B * 1e6:7.1f} us/sample)", flush=True)
    return dt


def packed_dense_path(xp):
    """All-dense variant: grouped convs replaced by banded dense convs."""
    h = conv2d_p(xp, PK_STEM_S, padding=1)
    h = conv2d_p(h, PK_STEM_T_DENSE)
    h = jax.nn.relu(h)
    short = conv2d_p(h, PK_PROJ, stride=2)
    b = conv2d_p(h, PK_A)
    b = jax.nn.relu(b)
    b = conv2d_p(b, PK_DW_DENSE, stride=2, padding=1)
    b = swish(b)
    b = conv2d_p(b, PK_C)
    return jax.nn.relu(short + b)


def main():
    x = jax.random.normal(jax.random.PRNGKey(9), (B, T, H, W, 3), jnp.float32)

    ref = reference_path(x)
    got = unpack(packed_path(pack(x)))
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print("relative max err grouped (fp32):", err, flush=True)
    assert err < 2e-2, err
    got2 = unpack(packed_dense_path(pack(x)))
    err2 = float(jnp.max(jnp.abs(ref - got2)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print("relative max err dense (fp32):", err2, flush=True)
    assert err2 < 2e-2, err2

    xb = x.astype(DTYPE)
    t_ref = timed("reference NDHWC", reference_path, xb)
    t_dense = timed("packed C*T dense", packed_dense_path, pack(xb))
    print(f"dense speedup: {t_ref / t_dense:.2f}x")


if __name__ == "__main__":
    main()
