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


def postprocess_probs(out) -> Dict[str, np.ndarray]:
    """Raw head outputs -> soft maps: binary heads pass through (sigmoid is
    applied in-model, matching the reference's has_sigmoid decoders), class
    heads softmax to probabilities."""
    result = {}
    for key, val in out.items():
        val = np.asarray(val.astype(jnp.float32))
        if key in ("pre", "post", "cls"):
            e = np.exp(val - val.max(-1, keepdims=True))
            val = e / e.sum(-1, keepdims=True)
        result[key] = val
    return result


def calibrate_quant_scales(model: Change3D, variables, batches) -> dict:
    """Record static int8 activation ranges for a quantized model.

    ``model``'s backbone must have ``quantized_eval=True`` (any quant_mode —
    a 'calibrate'-mode twin is built internally); ``batches`` yields
    (pre, post) pairs. Returns the 'quant' variable collection (per-site
    max-abs) to merge into the serving variables:

        scales = calibrate_quant_scales(model_static, variables, batches)
        Predictor(model_static, {**variables, "quant": scales})

    Calibrate in the SAME packed/fused configuration you serve with — the
    quantized conv sites differ between layouts.
    """
    import dataclasses as _dc

    from change3d_tpu.models.x3d import x3d_l_config

    cfg = _dc.replace(
        model.backbone_cfg or x3d_l_config(),
        quantized_eval=True, quant_mode="calibrate",
    )
    calib = model.clone(backbone_cfg=cfg)
    qvars: dict = {}
    for pre, post in batches:
        inputs = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
        if qvars:
            inputs["quant"] = qvars
        _, mut = calib.apply(
            inputs, jnp.asarray(pre), jnp.asarray(post), train=False,
            mutable=["quant"],
        )
        qvars = mut["quant"]
    if not qvars:
        raise ValueError("calibration saw no batches")
    return qvars


class Predictor:
    def __init__(
        self,
        model: Change3D,
        variables,
        *,
        compute_dtype=jnp.bfloat16,
        embed_weights: bool = False,
        shard: bool = False,
    ):
        """``embed_weights=True`` closes the weights over the jitted forward
        (serving mode): XLA sees them as compile-time constants, so the BN
        scale/shift vectors constant-fold into neighboring work instead of
        arriving as runtime parameters. Use for long-lived predictors whose
        weights never change; leave off when variables will be swapped.

        ``shard=True`` spreads each batch over ALL local devices (1-D data
        mesh, parameters replicated — the same GSPMD layout the training
        engine uses): serving throughput scales with the chips on the host.
        The device count must divide the batch size; the serving batcher's
        fixed padded batches satisfy this whenever --batch_size is a
        multiple of the chip count. Per-sample results are unchanged
        (eval BN, per-sample int8 scales)."""
        bb = getattr(model, "backbone_cfg", None)
        if (bb is not None and bb.quantized_eval and bb.quant_mode == "static"
                and "quant" not in variables):
            raise ValueError(
                "static quant_mode needs calibrated scales: merge "
                "calibrate_quant_scales(...) into variables as 'quant'"
            )
        self.model = model
        self.compute_dtype = compute_dtype
        self._put_batch = jnp.asarray
        # Every dispatched batch shape must divide over the shard mesh;
        # the serving layer filters its batching buckets by this.
        self.batch_divisor = len(jax.devices()) if shard else 1
        if shard:
            from change3d_tpu.parallel.mesh import (
                batch_sharding,
                make_mesh,
                replicated_sharding,
            )

            mesh = make_mesh()
            bsh = batch_sharding(mesh)
            variables = jax.device_put(variables, replicated_sharding(mesh))
            # device_put straight from host memory: jnp.asarray first would
            # stage the whole batch on device 0 before resharding.
            self._put_batch = lambda arr: jax.device_put(arr, bsh)
        self.variables = variables
        self._embed_weights = embed_weights
        self._forward_u8 = None  # built lazily by predict_u8
        fwd = self._make_forward()
        if embed_weights:
            self._forward = jax.jit(lambda v, pre, post: fwd(variables, pre, post))
        else:
            self._forward = jax.jit(fwd)

    def _jit(self, fwd):
        """jit with the predictor's embed_weights policy applied."""
        if self._embed_weights:
            variables = self.variables
            return jax.jit(lambda v, pre, post: fwd(variables, pre, post))
        return jax.jit(fwd)

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

    def predict_probs(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        """Soft per-task maps: binary heads as sigmoid probabilities
        [B,h,w,1], class heads as softmax probabilities [B,h,w,C]. The
        blendable form tiled inference averages over overlaps."""
        return postprocess_probs(
            self._forward(self.variables, self._put_batch(pre), self._put_batch(post))
        )

    @staticmethod
    def harden(probs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Soft maps -> decisions: binary heads thresholded at 0.5, class
        heads argmaxed (same decisions as thresholding/argmaxing the raw
        model outputs — sigmoid/softmax are monotone)."""
        result = {}
        for key, val in probs.items():
            if key in ("change", "loc"):
                result[key] = val[..., 0] > 0.5
            elif key in ("pre", "post", "cls"):
                result[key] = val.argmax(-1)
            else:
                result[key] = val
        return result

    def predict(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        """pre/post: [B,H,W,3] normalized float images. Returns per-task masks:
        BCD: {'change': bool mask}; SCD: {'pre','post': class ids, 'change'};
        BDA: {'cls': class ids, 'loc': bool mask}."""
        return self.harden(self.predict_probs(pre, post))

    def _make_forward_u8(self):
        model, dtype = self.model, self.compute_dtype
        # Binary masks leave the device BITPACKED (uint8, 8 pixels/byte,
        # np.unpackbits big-endian order) when the width allows: the
        # device->host link is the serving bottleneck when the chip sits
        # behind a tunnel (measured 0.4-3 MB/s down vs ~1 GB/s up), and a
        # [B,H,W] bool costs 8x the bytes of its packed form. Class-id maps
        # are already 1 byte/pixel.
        pack = model.in_width % 8 == 0
        pows = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint32)

        def forward(variables, pre, post):
            # Detection eval normalization ((x/255 - .5)/.5 == x/127.5 - 1,
            # data.transforms.eval_normalize) fused into the jitted forward.
            # Normalize in fp32 with eval_normalize's exact op sequence,
            # THEN cast to compute_dtype: the model sees bit-identical
            # inputs to the host-normalize float path even in bf16
            # production (a u8->bf16 fused multiply can land 1 ulp off and
            # flip near-tie threshold/argmax decisions).
            def norm(a):
                x = (a.astype(jnp.float32) / 255.0 - 0.5) / 0.5
                return x.astype(dtype)

            out = model.apply(variables, norm(pre), norm(post), train=False)
            hard = {}
            for key, val in out.items():
                if key in ("change", "loc"):
                    mask = val[..., 0] > 0.5
                    if pack:
                        b, h, w = mask.shape
                        grouped = mask.reshape(b, h, w // 8, 8).astype(jnp.uint32)
                        mask = (grouped * pows).sum(-1).astype(jnp.uint8)
                    hard[key] = mask
                elif key in ("pre", "post", "cls"):
                    hard[key] = jnp.argmax(val, axis=-1).astype(jnp.uint8)
                else:
                    hard[key] = val
            return hard

        return forward

    def predict_u8_async(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, jax.Array]:
        """Launch the u8 forward and return DEVICE arrays without blocking
        (JAX dispatch is async): callers overlap the device->host fetch of
        one batch with the compute of the next (the serving batcher's
        pipelined mode). Pass the result to :meth:`finalize_u8`."""
        if self._forward_u8 is None:
            self._forward_u8 = self._jit(self._make_forward_u8())
        return self._forward_u8(
            self.variables, self._put_batch(pre), self._put_batch(post)
        )

    def finalize_u8(self, out: Dict[str, jax.Array]) -> Dict[str, np.ndarray]:
        """Block on a :meth:`predict_u8_async` result, fetch it, and unpack
        the bitpacked binary masks back to [B,H,W] bool."""
        w = self.model.in_width
        fetched = {}
        for key, val in out.items():
            arr = np.asarray(val)
            if key in ("change", "loc") and w % 8 == 0:
                arr = np.unpackbits(arr, axis=-1).astype(bool)[..., :w]
            fetched[key] = arr
        return fetched

    def predict_u8(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        """Transfer-lean serving forward: raw [B,H,W,3] uint8 in, hardened
        masks out (same decisions as :meth:`predict` on eval-normalized
        floats — sigmoid/softmax are monotone, so thresholding/argmaxing on
        device is exact, not approximate).

        The eval normalization, the hardening, and the binary-mask
        bitpacking run inside one jitted computation, so host<->device
        traffic is uint8 pixels up and packed-bit/uint8 masks down — ~4x
        less up and 4-240x less down than the float path. That is the
        difference between compute-bound and link-bound serving when the
        chip sits behind a slow tunnel (tests/manual_serve_bench.py
        measures the served effect)."""
        return self.finalize_u8(self.predict_u8_async(pre, post))


class ArtifactPredictor:
    """Predictor-compatible wrapper over an AOT StableHLO artifact
    (change3d_tpu.export): same ``predict``/``predict_probs`` surface, so
    the serving layer and :class:`TiledPredictor` work on either weights
    source. Input geometry is read from the artifact's own avals."""

    def __init__(self, path_or_bytes):
        from types import SimpleNamespace

        from change3d_tpu.export import load_exported

        self._fn = load_exported(path_or_bytes)
        b, h, w, _ = self._fn.input_shape  # batch may be symbolic
        self.model = SimpleNamespace(in_height=int(h), in_width=int(w))
        # Concrete when exported with --batch N (callers must match it).
        self.fixed_batch = int(b) if isinstance(b, int) else None

    def predict_probs(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        return postprocess_probs(self._fn(pre, post))

    def predict(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        return Predictor.harden(self.predict_probs(pre, post))


class TiledPredictor:
    """Full-scene inference for scenes larger than the model's patch size.

    Slides the model's fixed (in_height, in_width) window over the scene
    with ``overlap``, runs the tiles through the wrapped :class:`Predictor`
    in fixed-size batches (one compiled forward, static shapes, reused for
    every scene), cosine-blends the soft maps over the overlaps and hardens
    once at the end — so seams average in probability space rather than
    flickering between per-tile decisions.

    The reference has no scene-level path at all (it evaluates on pre-cropped
    256x256 patches only, ref: /root/reference/README.md:76 "crop each image
    into 256x256 patches").
    """

    def __init__(self, predictor: Predictor, *, overlap: int = 32, batch_size: int = 16):
        if overlap < 0 or overlap >= min(predictor.model.in_height, predictor.model.in_width):
            raise ValueError(f"overlap {overlap} must be in [0, tile size)")
        self.predictor = predictor
        self.overlap = overlap
        self.batch_size = batch_size

    def predict_scene_probs(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        """pre/post: one [H, W, 3] normalized float scene, any size.
        Returns blended soft maps at scene resolution.

        Tiles are sliced and accumulated into the blend canvas batch by
        batch, so peak host memory stays O(scene) (one padded copy of each
        input + one canvas per output key), independent of tile count."""
        from change3d_tpu.utils.tiling import blend_window, pad_scene, scene_offsets

        th = self.predictor.model.in_height
        tw = self.predictor.model.in_width
        pre_p = pad_scene(np.asarray(pre, np.float32), th, tw)
        post_p = pad_scene(np.asarray(post, np.float32), th, tw)
        ch, cw = pre_p.shape[:2]
        offsets = scene_offsets(ch, cw, th, tw, self.overlap)

        w = blend_window(th, tw, self.overlap)[..., None]
        acc: Dict[str, np.ndarray] = {}
        wacc = np.zeros((ch, cw, 1), np.float32)
        b = self.batch_size
        for i in range(0, len(offsets), b):
            group = offsets[i : i + b]
            pre_t = np.stack([pre_p[y : y + th, x : x + tw] for y, x in group])
            post_t = np.stack([post_p[y : y + th, x : x + tw] for y, x in group])
            pad = b - len(group)
            if pad:
                pre_t = np.concatenate([pre_t, np.repeat(pre_t[-1:], pad, axis=0)])
                post_t = np.concatenate([post_t, np.repeat(post_t[-1:], pad, axis=0)])
            probs = self.predictor.predict_probs(pre_t, post_t)
            for j, (y, x) in enumerate(group):
                for key, val in probs.items():
                    if key not in acc:
                        acc[key] = np.zeros((ch, cw, val.shape[-1]), np.float32)
                    acc[key][y : y + th, x : x + tw] += val[j] * w
                wacc[y : y + th, x : x + tw] += w

        h0, w0 = pre.shape[:2]
        return {key: (a / wacc)[:h0, :w0] for key, a in acc.items()}

    def predict_scene(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        """Hardened scene-resolution masks (same decision rules as
        :meth:`Predictor.predict`, shapes [H, W] / [H, W] int)."""
        return Predictor.harden(self.predict_scene_probs(pre, post))


def tokens_to_captions(tokens, word_map: Dict[str, int]) -> List[str]:
    """Decoded id rows -> sentences, stripping <start>/<end>/<pad>."""
    rev = {v: k for k, v in word_map.items()}
    special = {word_map["<start>"], word_map["<end>"], word_map.get("<pad>", 0)}
    return [
        " ".join(rev.get(int(t), "<unk>") for t in row if int(t) not in special)
        for row in np.asarray(tokens)
    ]


class CaptionArtifactPredictor:
    """``caption()`` over an AOT caption artifact (encoder + beam decode are
    baked in; the word map travels separately — ids are the vocabulary,
    see export_caption_model)."""

    def __init__(self, path_or_bytes, word_map: Dict[str, int]):
        from types import SimpleNamespace

        from change3d_tpu.export import load_exported_captioner

        self._fn = load_exported_captioner(path_or_bytes)
        self.word_map = word_map
        b, h, w, _ = self._fn.input_shape
        self.model = SimpleNamespace(in_height=int(h), in_width=int(w))
        self.fixed_batch = int(b) if isinstance(b, int) else None

    def caption(self, pre: np.ndarray, post: np.ndarray) -> List[str]:
        tokens, _ = self._fn(pre, post)
        return tokens_to_captions(tokens, self.word_map)


class CaptionPredictor(Predictor):
    def __init__(self, model: Change3D, variables, word_map: Dict[str, int], *, beam_size: int = 1, **kw):
        embed = kw.get("embed_weights", False)
        super().__init__(model, variables, **kw)
        self.word_map = word_map
        self.rev = {v: k for k, v in word_map.items()}
        self.beam_size = beam_size
        self._decode_u8 = None  # built lazily by caption_u8
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
        tokens, _ = self._decode(
            self.variables, self._put_batch(pre), self._put_batch(post)
        )
        return tokens_to_captions(tokens, self.word_map)

    def caption_u8(self, pre: np.ndarray, post: np.ndarray) -> List[str]:
        """Transfer-lean captioning: raw [B,H,W,3] uint8 in; the ImageNet
        normalization (/255, mean/std — ref:
        /root/reference/scripts/train_CC.py:466-469) runs inside the jitted
        decode, so only uint8 pixels cross the host->device link."""
        if self._decode_u8 is None:
            from change3d_tpu.data.datasets import CaptionDataset

            dec = self._make_decode()
            mean = jnp.asarray(CaptionDataset.MEAN)
            std = jnp.asarray(CaptionDataset.STD)

            def decode_u8(variables, pre, post):
                def norm(a):
                    return (a.astype(jnp.float32) / 255.0 - mean) / std

                return dec(variables, norm(pre), norm(post))

            self._decode_u8 = self._jit(decode_u8)
        tokens, _ = self._decode_u8(
            self.variables, self._put_batch(pre), self._put_batch(post)
        )
        return tokens_to_captions(tokens, self.word_map)
