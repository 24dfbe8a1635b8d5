"""Kernel-level parity tests against torch (CPU) as the golden oracle.

The reference's compute is stock torch ops (SURVEY.md §2.4); these tests pin
our NDHWC/TPU formulations to the same math without porting any code.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from change3d_tpu.ops import (
    conv3d,
    depthwise_conv3d,
    pointwise_conv3d,
    conv2d,
    conv_transpose2d,
    swish,
    squeeze_excite_3d,
    multi_head_attention,
)
from change3d_tpu.ops.norm import BatchNorm, fold_bn_into_conv, batch_norm_inference

RNG = np.random.RandomState(0)


def t2j_conv3d_w(w):
    # torch (O, I/g, kd, kh, kw) -> ours (kd, kh, kw, I/g, O)
    return jnp.asarray(w.numpy().transpose(2, 3, 4, 1, 0))


def assert_close(a, b, tol=1e-4):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_conv3d_matches_torch():
    x = RNG.randn(2, 3, 8, 8, 6).astype(np.float32)  # B,T,H,W,C
    w = RNG.randn(10, 6, 3, 3, 3).astype(np.float32) * 0.1
    ref = F.conv3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), torch.from_numpy(w), padding=1)
    out = conv3d(jnp.asarray(x), t2j_conv3d_w(torch.from_numpy(w)), padding=(1, 1, 1))
    assert_close(out, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_conv3d_strided():
    x = RNG.randn(1, 3, 9, 9, 4).astype(np.float32)
    w = RNG.randn(8, 4, 1, 1, 1).astype(np.float32)
    ref = F.conv3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), torch.from_numpy(w), stride=(1, 2, 2))
    out = conv3d(jnp.asarray(x), t2j_conv3d_w(torch.from_numpy(w)), stride=(1, 2, 2))
    assert_close(out, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_depthwise_conv3d_matches_torch():
    c = 12
    x = RNG.randn(2, 3, 8, 8, c).astype(np.float32)
    w = RNG.randn(c, 1, 3, 3, 3).astype(np.float32) * 0.2
    ref = F.conv3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), torch.from_numpy(w), padding=1, groups=c)
    out = depthwise_conv3d(jnp.asarray(x), t2j_conv3d_w(torch.from_numpy(w)))
    assert_close(out, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_depthwise_temporal_stem_conv():
    # Stem temporal conv: k (5,1,1), pad (2,0,0), depthwise.
    c = 24
    x = RNG.randn(1, 3, 6, 6, c).astype(np.float32)
    w = RNG.randn(c, 1, 5, 1, 1).astype(np.float32)
    ref = F.conv3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), torch.from_numpy(w), padding=(2, 0, 0), groups=c)
    out = depthwise_conv3d(jnp.asarray(x), t2j_conv3d_w(torch.from_numpy(w)), padding=(2, 0, 0))
    assert_close(out, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_pointwise_conv3d_is_1x1x1_conv():
    x = RNG.randn(2, 3, 5, 5, 16).astype(np.float32)
    w = RNG.randn(32, 16, 1, 1, 1).astype(np.float32)
    ref = F.conv3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), torch.from_numpy(w))
    out = pointwise_conv3d(jnp.asarray(x), jnp.asarray(w[:, :, 0, 0, 0].T))
    assert_close(out, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_conv_transpose2d_matches_torch():
    x = RNG.randn(2, 8, 8, 6).astype(np.float32)
    w = RNG.randn(6, 10, 4, 4).astype(np.float32) * 0.1  # torch (in, out, kh, kw)
    b = RNG.randn(10).astype(np.float32)
    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=1,
    )
    out = conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 0, 1)), jnp.asarray(b), stride=2, padding=1
    )
    assert out.shape == (2, 16, 16, 10)
    assert_close(out, ref.numpy().transpose(0, 2, 3, 1))


def test_conv2d_3x3():
    x = RNG.randn(2, 8, 8, 6).astype(np.float32)
    w = RNG.randn(4, 6, 3, 3).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w), padding=1)
    out = conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), padding=(1, 1))
    assert_close(out, ref.numpy().transpose(0, 2, 3, 1))


def test_swish():
    x = RNG.randn(4, 5).astype(np.float32)
    assert_close(swish(jnp.asarray(x)), (torch.from_numpy(x) * torch.sigmoid(torch.from_numpy(x))).numpy())


def test_squeeze_excite_matches_manual_torch():
    b, t, h, w, c, cr = 2, 3, 4, 4, 16, 8
    x = RNG.randn(b, t, h, w, c).astype(np.float32)
    w1 = RNG.randn(cr, c, 1, 1, 1).astype(np.float32)
    b1 = RNG.randn(cr).astype(np.float32)
    w2 = RNG.randn(c, cr, 1, 1, 1).astype(np.float32)
    b2 = RNG.randn(c).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    sq = xt.mean(dim=(2, 3, 4), keepdim=True)
    gate = torch.sigmoid(F.conv3d(F.relu(F.conv3d(sq, torch.from_numpy(w1), torch.from_numpy(b1))), torch.from_numpy(w2), torch.from_numpy(b2)))
    ref = xt * gate
    out = squeeze_excite_3d(
        jnp.asarray(x),
        jnp.asarray(w1[:, :, 0, 0, 0].T), jnp.asarray(b1),
        jnp.asarray(w2[:, :, 0, 0, 0].T), jnp.asarray(b2),
    )
    assert_close(out, ref.numpy().transpose(0, 2, 3, 4, 1))


def test_batch_norm_train_and_eval_match_torch():
    c = 6
    x = RNG.randn(4, 3, 5, 5, c).astype(np.float32) * 2 + 1
    tbn = torch.nn.BatchNorm3d(c, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(RNG.randn(c).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(RNG.randn(c).astype(np.float32)))
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()), "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"],
    }

    # Two training steps: outputs and running stats must track torch.
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    for _ in range(2):
        ref = tbn(xt)
        out, updates = bn.apply(variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}
        assert_close(out, ref.detach().numpy().transpose(0, 2, 3, 4, 1), tol=1e-4)
    assert_close(variables["batch_stats"]["mean"], tbn.running_mean.numpy(), tol=1e-5)
    assert_close(variables["batch_stats"]["var"], tbn.running_var.numpy(), tol=1e-5)

    # Eval mode.
    tbn.eval()
    ref = tbn(xt)
    out = bn.apply(variables, jnp.asarray(x), use_running_average=True)
    assert_close(out, ref.detach().numpy().transpose(0, 2, 3, 4, 1), tol=1e-4)


def test_fold_bn_into_conv():
    c_in, c_out = 4, 8
    x = RNG.randn(2, 3, 6, 6, c_in).astype(np.float32)
    w = (RNG.randn(1, 1, 1, c_in, c_out) * 0.3).astype(np.float32)
    scale = RNG.rand(c_out).astype(np.float32) + 0.5
    bias = RNG.randn(c_out).astype(np.float32)
    mean = RNG.randn(c_out).astype(np.float32)
    var = RNG.rand(c_out).astype(np.float32) + 0.2
    y_ref = batch_norm_inference(conv3d(jnp.asarray(x), jnp.asarray(w)), scale, bias, mean, var)
    wf, bf = fold_bn_into_conv(jnp.asarray(w), scale, bias, mean, var)
    y = conv3d(jnp.asarray(x), wf) + bf
    assert_close(y, np.asarray(y_ref), tol=1e-4)


def test_multi_head_attention_matches_torch():
    e, heads, lq, lk, b = 32, 4, 7, 9, 2
    q = RNG.randn(b, lq, e).astype(np.float32)
    k = RNG.randn(b, lk, e).astype(np.float32)
    mha = torch.nn.MultiheadAttention(e, heads, dropout=0.0)
    mask = np.triu(np.full((lq, lk), -np.inf, np.float32), 1)
    with torch.no_grad():
        ref, _ = mha(
            torch.from_numpy(q.transpose(1, 0, 2)),
            torch.from_numpy(k.transpose(1, 0, 2)),
            torch.from_numpy(k.transpose(1, 0, 2)),
            attn_mask=torch.from_numpy(mask),
        )
    params = {
        "in_proj_w": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
        "in_proj_b": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        "out_w": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
        "out_b": jnp.asarray(mha.out_proj.bias.detach().numpy()),
    }
    out = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), params, heads, attn_mask=jnp.asarray(mask))
    assert_close(out, ref.numpy().transpose(1, 0, 2), tol=2e-4)
