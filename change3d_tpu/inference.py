"""Inference / serving: load trained weights, jitted batched predictors.

The reference has no serving path (inference happens inside the val loops).
This module gives the deployment story the TPU build needs:

- ``Predictor``: wraps a trained Change3D ``variables`` tree with a jitted,
  batched, bf16 forward per task; accepts numpy HWC images and returns
  numpy masks / captions.
- eval-mode BatchNorm runs from running statistics (no batch coupling), so
  serving results are deterministic and batch-size independent.
- weights come from an Orbax ``best`` checkpoint (``from_checkpoint``) or an
  in-memory variables tree (``Predictor(model, variables)``).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.caption_decoder import MAX_CAPTION_LEN, beam_search_decode


def restore_best_variables(model: Change3D, save_path: str):
    """Restore the ``best`` checkpoint under an experiment dir into a fresh
    variables template for ``model`` (shared by Predictor and the AOT
    exporter)."""
    from change3d_tpu.checkpoint.orbax_io import CheckpointManager

    sample = jnp.zeros((1, model.in_height, model.in_width, 3), jnp.float32)
    kwargs = {}
    if model.task == Task.CC:
        kwargs["captions"] = jnp.zeros((1, 4), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), sample, sample, **kwargs)
    return CheckpointManager(save_path).restore_best(
        {"params": template["params"], "batch_stats": template.get("batch_stats", {})}
    )


class Predictor:
    def __init__(
        self,
        model: Change3D,
        variables,
        *,
        compute_dtype=jnp.bfloat16,
        embed_weights: bool = False,
    ):
        """``embed_weights=True`` closes the weights over the jitted forward
        (serving mode): XLA sees them as compile-time constants, so the BN
        scale/shift vectors constant-fold into neighboring work instead of
        arriving as runtime parameters. Use for long-lived predictors whose
        weights never change; leave off when variables will be swapped."""
        self.model = model
        self.variables = variables
        self.compute_dtype = compute_dtype
        fwd = self._make_forward()
        if embed_weights:
            self._forward = jax.jit(lambda v, pre, post: fwd(variables, pre, post))
        else:
            self._forward = jax.jit(fwd)

    def _make_forward(self):
        model, dtype = self.model, self.compute_dtype

        def forward(variables, pre, post):
            return model.apply(
                variables, pre.astype(dtype), post.astype(dtype), train=False
            )

        return forward

    @classmethod
    def from_checkpoint(cls, model: Change3D, save_path: str, **kw) -> "Predictor":
        return cls(model, restore_best_variables(model, save_path), **kw)

    def predict(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        """pre/post: [B,H,W,3] normalized float images. Returns per-task masks:
        BCD: {'change': bool mask}; SCD: {'pre','post': class ids, 'change'};
        BDA: {'cls': class ids, 'loc': bool mask}."""
        out = self._forward(self.variables, jnp.asarray(pre), jnp.asarray(post))
        result = {}
        for key, val in out.items():
            val = np.asarray(val.astype(jnp.float32))
            if key in ("change", "loc"):
                result[key] = val[..., 0] > 0.5
            elif key in ("pre", "post", "cls"):
                result[key] = val.argmax(-1)
            else:
                result[key] = val
        return result


class CaptionPredictor(Predictor):
    def __init__(self, model: Change3D, variables, word_map: Dict[str, int], *, beam_size: int = 1, **kw):
        embed = kw.get("embed_weights", False)
        super().__init__(model, variables, **kw)
        self.word_map = word_map
        self.rev = {v: k for k, v in word_map.items()}
        self.beam_size = beam_size
        dec = self._make_decode()
        if embed:
            self._decode = jax.jit(lambda v, pre, post: dec(variables, pre, post))
        else:
            self._decode = jax.jit(dec)

    def _make_decode(self):
        from change3d_tpu.models.caption_decoder import make_incremental_fns

        model, dtype, k, wm = self.model, self.compute_dtype, self.beam_size, self.word_map
        incremental = make_incremental_fns(model)

        def decode(variables, pre, post):
            out = model.apply(variables, pre.astype(dtype), post.astype(dtype), train=False)

            def apply_tokens(vs, tokens, mem):
                return model.apply(vs, tokens, mem, method=model.decode_captions)

            tokens, scores = beam_search_decode(
                apply_tokens, variables, out["memory"],
                beam_size=k,
                start_token=wm["<start>"],
                end_token=wm["<end>"],
                pad_token=wm.get("<pad>", 0),
                max_len=MAX_CAPTION_LEN,
                incremental=incremental,
            )
            return tokens, scores

        return decode

    def caption(self, pre: np.ndarray, post: np.ndarray) -> List[str]:
        tokens, _ = self._decode(self.variables, jnp.asarray(pre), jnp.asarray(post))
        special = {self.word_map["<start>"], self.word_map["<end>"], self.word_map.get("<pad>", 0)}
        return [
            " ".join(self.rev.get(int(t), "<unk>") for t in row if int(t) not in special)
            for row in np.asarray(tokens)
        ]
