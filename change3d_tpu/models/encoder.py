"""Change3D encoder: perception frames + X3D + temporal-difference enhancement.

Reimplements the semantics of ``Encoder`` (ref: /root/reference/model/trainer.py:20-167):

- a learnable clip of N perception frames, standard-normal init, stacked
  between pre and post image on the temporal axis -> [B, N+2, H, W, 3];
- after each of blocks 0..3 (stem..stage3), ``enhance`` computes
  |pre - post| at that scale, passes it through a per-stage 1x1 conv + ReLU,
  and adds it residually to the *middle* temporal frame only
  (ref: /root/reference/model/trainer.py:71-108);
- the per-stage taps are the features at temporal indices 1..N
  (ref: /root/reference/model/trainer.py:136-139) with channel dims
  [24, 24, 48, 96] and spatial strides {1, 2, 4, 8};
- the change-captioning path runs blocks 0..4 *without* enhancement and
  returns the stage-4 feature of temporal index N
  (ref: /root/reference/model/trainer.py:120-124).

Layout: [B, T, H, W, C] throughout.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import flax.linen as nn

from change3d_tpu.init import normal_init, torch_conv_kernel_init
from change3d_tpu.models.x3d import X3D, X3DConfig, x3d_l_config
from change3d_tpu.ops.layers import pointwise_conv3d

# Channel dims of the four tap points (stem, stage1, stage2, stage3) for the
# default X3D-L instantiation (ref: /root/reference/model/trainer.py:186).
EMBED_DIMS = (24, 24, 48, 96)


def tap_dims(cfg: X3DConfig):
    """Channel dims at the four tap points for an arbitrary backbone config."""
    return (cfg.stem_dim_out,) + tuple(cfg.stage_dims[:3])


class Encoder(nn.Module):
    num_perception_frames: int
    in_height: int = 256
    in_width: int = 256
    cfg: X3DConfig = None  # type: ignore[assignment]

    def setup(self):
        cfg = self.cfg or x3d_l_config()
        self.x3d = X3D(cfg)
        # Learnable perception frames [1, N, H, W, 3], randn init
        # (ref: /root/reference/model/trainer.py:51-54, torch [1,3,N,H,W]).
        self.perception_frames = self.param(
            "perception_frames",
            normal_init,
            (1, self.num_perception_frames, self.in_height, self.in_width, 3),
        )
        # Per-stage enhancement convs, 1x1, bias-free, torch-default init
        # (encoder is not weight_init'd; ref: /root/reference/model/trainer.py:57-69).
        self.fc = [
            EnhanceFC(dim, name=f"fc{i}") for i, dim in enumerate(tap_dims(cfg))
        ]

    def _stack_frames(self, pre: jax.Array, post: jax.Array) -> jax.Array:
        b = pre.shape[0]
        percep = jnp.broadcast_to(
            self.perception_frames.astype(pre.dtype),
            (b,) + self.perception_frames.shape[1:],
        )
        return jnp.concatenate([pre[:, None], percep, post[:, None]], axis=1)

    def _enhance(self, x: jax.Array, stage: int, packed_t: int = 0) -> jax.Array:
        """|pre - post| -> 1x1 conv -> add to the middle frame. With
        ``packed_t`` the input is time-packed [B, H, W, C*T] (c-major, t
        minor): frame t of channel c lives at lane c*T + t, so per-frame
        views are strided lane slices — no unpack round-trip."""
        n = self.num_perception_frames
        if packed_t:
            middle = packed_t // 2
            diff = jnp.abs(x[..., 0::packed_t] - x[..., n + 1 :: packed_t])
            enh = self.fc[stage](diff)
            return x.at[..., middle::packed_t].add(enh)
        middle = x.shape[1] // 2
        diff = jnp.abs(x[:, 0] - x[:, n + 1])
        enh = self.fc[stage](diff)
        return x.at[:, middle].add(enh)

    def __call__(
        self, pre: jax.Array, post: jax.Array, *, train: bool = False, output_final: bool = False
    ):
        """pre/post: [B, H, W, 3].

        Returns list of 4 stages x list of N per-frame features [B,H',W',C']
        — or the single stage-4 CC feature when ``output_final``.

        When consecutive blocks run time-packed (cfg.packed_eval_stages), the
        packed layout is carried straight through enhance and the tap slices,
        so each packed *span* costs exactly one pack (and zero unpacks when
        the taps themselves are read as lane slices).
        """
        from change3d_tpu.models.x3d import block_runs_packed

        cfg = self.cfg or x3d_l_config()
        x = self._stack_frames(pre, post)
        n = self.num_perception_frames

        # cur_t tracks the temporal length at the current block boundary: read
        # from the tensor while unpacked, and invariant across packed blocks
        # (block_runs_packed requires temporal stride 1) — never assumed equal
        # to the input clip length, in case an earlier block strided time.
        cur_t = x.shape[1]

        if output_final:
            packed_now = 0
            for i in range(5):
                runs = block_runs_packed(cfg, i, train)
                x = self.x3d.run_block(
                    i, x, train=train, packed_in=packed_now, keep_packed=runs
                )
                packed_now = cur_t if runs else 0
                if not packed_now:
                    cur_t = x.shape[1]
            if packed_now:
                return x[..., n::packed_now]
            return x[:, n]

        taps: List[List[jax.Array]] = []
        packed_now = 0
        for i in range(4):
            runs = block_runs_packed(cfg, i, train)
            x = self.x3d.run_block(
                i, x, train=train, packed_in=packed_now, keep_packed=runs
            )
            packed_now = cur_t if runs else 0
            if not packed_now:
                cur_t = x.shape[1]
            x = self._enhance(x, i, packed_now)
            if packed_now:
                taps.append([x[..., idx + 1 :: packed_now] for idx in range(n)])
            else:
                taps.append([x[:, idx + 1] for idx in range(n)])
        return taps


class EnhanceFC(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("conv", torch_conv_kernel_init, (self.dim, self.dim))
        return jax.nn.relu(pointwise_conv3d(x, w))
