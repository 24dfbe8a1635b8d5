"""Task-level model assembly: encoder + per-task heads.

Replaces the reference ``Trainer`` module and its implicit task selection by
``num_perception_frame`` + dataset-name substring matching
(ref: /root/reference/model/trainer.py:170-306) with an explicit task enum:

  BCD (N=1): one binary ChangeDecoder          -> mask [B,H,W,1]
  SCD (N=3): pre/post semantic + binary change -> 3 masks
  BDA (N=2): damage-class + binary location    -> 2 masks
  CC  (N=1): caption decoder on the stage-4 perception feature

Per-frame feature routing matches /root/reference/model/trainer.py:221-306:
BCD uses frame 0 of every stage; SCD frames (0,1,2) -> (pre, change, post);
BDA frames (0,1) -> (cls, loc); CC uses the final-stage feature.
"""

from __future__ import annotations

import enum
from typing import Any, Dict

import flax.linen as nn

from change3d_tpu.models.encoder import Encoder, tap_dims
from change3d_tpu.models.change_decoder import ChangeDecoder
from change3d_tpu.models.caption_decoder import CaptionDecoder
from change3d_tpu.models.x3d import X3DConfig, x3d_l_config


class Task(str, enum.Enum):
    BCD = "bcd"
    SCD = "scd"
    BDA = "bda"
    CC = "cc"


PERCEPTION_FRAMES = {Task.BCD: 1, Task.SCD: 3, Task.BDA: 2, Task.CC: 1}


class Change3D(nn.Module):
    """The unified Change3D model.

    Attributes:
      task: which task head set to build.
      num_classes: semantic classes (SCD: 7 total incl. no-change -> heads
        output args.num_class; reference defaults: SCD num_class=6? see
        scripts — SCD uses 7-class metrics with heads of ``num_class``;
        BDA num_class=5).
      in_height/in_width: perception-frame spatial size.
      vocab_size...: caption head configuration (CC only).
    """

    task: Task
    num_classes: int = 1
    in_height: int = 256
    in_width: int = 256
    vocab_size: int = 0
    embed_dim: int = 192
    num_heads: int = 8
    num_layers: int = 3
    dropout: float = 0.1
    backbone_cfg: X3DConfig = None  # type: ignore[assignment]

    def setup(self):
        cfg = self.backbone_cfg or x3d_l_config()
        dims = tap_dims(cfg)
        self.encoder = Encoder(
            num_perception_frames=PERCEPTION_FRAMES[self.task],
            in_height=self.in_height,
            in_width=self.in_width,
            cfg=cfg,
        )
        if self.task == Task.BCD:
            self.decoder = ChangeDecoder(1, has_sigmoid=True, in_dims=dims)
        elif self.task == Task.SCD:
            self.decoder_pre = ChangeDecoder(self.num_classes, in_dims=dims)
            self.decoder_post = ChangeDecoder(self.num_classes, in_dims=dims)
            self.decoder_change = ChangeDecoder(1, has_sigmoid=True, in_dims=dims)
        elif self.task == Task.BDA:
            self.decoder_cls = ChangeDecoder(self.num_classes, in_dims=dims)
            self.decoder_loc = ChangeDecoder(1, has_sigmoid=True, in_dims=dims)
        elif self.task == Task.CC:
            self.decoder = CaptionDecoder(
                vocab_size=self.vocab_size,
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                num_layers=self.num_layers,
                dropout=self.dropout,
            )

    def __call__(self, pre, post, captions=None, *, train: bool = False):
        """pre/post: [B, H, W, 3] normalized images. Returns a dict of task outputs."""
        if self.task == Task.CC:
            feat = self.encoder(pre, post, train=train, output_final=True)  # [B,h,w,192]
            b, h, w, c = feat.shape
            memory = feat.reshape(b, h * w, c)
            out: Dict[str, Any] = {"memory": memory}
            if captions is not None:
                out["logits"] = self.decoder(memory, captions, deterministic=not train)
            return out

        taps = self.encoder(pre, post, train=train)
        if self.task == Task.BCD:
            feats = [stage[0] for stage in taps]
            return {"change": self.decoder(feats)}
        if self.task == Task.SCD:
            pre_f = [stage[0] for stage in taps]
            change_f = [stage[1] for stage in taps]
            post_f = [stage[2] for stage in taps]
            return {
                "pre": self.decoder_pre(pre_f),
                "post": self.decoder_post(post_f),
                "change": self.decoder_change(change_f),
            }
        if self.task == Task.BDA:
            cls_f = [stage[0] for stage in taps]
            loc_f = [stage[1] for stage in taps]
            return {"cls": self.decoder_cls(cls_f), "loc": self.decoder_loc(loc_f)}
        raise ValueError(self.task)

    def decode_captions(self, tokens, memory, *, deterministic: bool = True):
        """Expose the caption decoder for beam search (CC only)."""
        return self.decoder.decode(tokens, memory, deterministic=deterministic)

    # KV-cached incremental decode surface (CC only; see
    # caption_decoder.make_incremental_fns).
    def init_decode_cache(self, batch: int, max_len: int, dtype=None):
        return self.decoder.init_decode_cache(batch, max_len, dtype)

    def precompute_memory_kv(self, memory):
        return self.decoder.precompute_memory_kv(memory)

    def decode_captions_step(self, tokens_t, memory_kv, cache, pos):
        return self.decoder.decode_step(tokens_t, memory_kv, cache, pos)
