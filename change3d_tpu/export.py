"""AOT model export: serialize a trained Change3D forward to a portable
StableHLO artifact (``jax.export``) and reload it without the model code.

The reference has no deployment story beyond pickled torch modules; here a
trained model exports to a single self-contained file whose compiled forward
can be served by any process with jax installed (CPU/TPU), with weights baked
in as constants — no flax, no model classes, no checkpoint tree needed at
serving time. Symbolic batch ("b") keeps one artifact valid for any batch
size.

Usage:
    from change3d_tpu.export import export_model, load_exported
    path = export_model(model, variables, "/models/bcd.stablehlo")
    fn = load_exported(path)           # (pre, post) -> task output dict
    masks = fn(pre_batch, post_batch)
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport


def _forward_fn(model, variables, compute_dtype):
    def forward(pre, post):
        out = model.apply(
            variables, pre.astype(compute_dtype), post.astype(compute_dtype), train=False
        )
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    return forward


def export_model(
    model,
    variables,
    path: Optional[str] = None,
    *,
    compute_dtype=jnp.bfloat16,
    platforms=("cpu", "tpu"),
    batch: Optional[int] = None,
) -> bytes:
    """Export ``model.apply(variables, pre, post, train=False)`` to a
    serialized StableHLO artifact. Weights are closed over as constants.

    batch=None exports with a symbolic batch dimension (any batch size);
    pass a concrete batch to pin it. Returns the serialized bytes and, if
    ``path`` is given, also writes them there.
    """
    h, w = model.in_height, model.in_width
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch
    spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    fn = jax.jit(_forward_fn(model, variables, compute_dtype))
    exported = jexport.export(fn, platforms=list(platforms))(spec, spec)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes) -> Callable:
    """Load a serialized artifact; returns ``fn(pre, post) -> dict`` taking
    numpy/jax arrays [B, H, W, 3] float32."""
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)

    @functools.wraps(exported.call)
    def fn(pre, post):
        return exported.call(jnp.asarray(pre, jnp.float32), jnp.asarray(post, jnp.float32))

    # Input geometry for wrappers (serving): (batch|symbol, H, W, 3).
    fn.input_shape = tuple(exported.in_avals[0].shape)
    return fn


def export_from_checkpoint(
    model, save_path: str, out_path: str, **kw
) -> bytes:
    """Convenience: restore the ``best`` checkpoint under ``save_path`` and
    export it."""
    from change3d_tpu.inference import restore_best_variables

    return export_model(model, restore_best_variables(model, save_path), out_path, **kw)


def export_caption_model(
    model,
    variables,
    word_map: dict,
    path: Optional[str] = None,
    *,
    beam_size: int = 1,
    compute_dtype=jnp.bfloat16,
    platforms=("cpu", "tpu"),
    batch: Optional[int] = None,
) -> bytes:
    """Export the FULL captioning pipeline — encoder forward + KV-cached
    beam-search decode — as one StableHLO artifact: ``fn(pre, post) ->
    (tokens [B, max_len] int32, scores [B] f32)``. Beam width, special
    tokens, and weights are baked in; the serving process maps ids back to
    words with its own word map (ids are stable — they ARE the vocabulary).
    """
    from change3d_tpu.train.caption_loop import make_decode_fn

    decode = make_decode_fn(model, beam_size, word_map)
    h, w = model.in_height, model.in_width
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch
    spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)

    def fn(pre, post):
        tokens, scores = decode(
            variables, pre.astype(compute_dtype), post.astype(compute_dtype)
        )
        return tokens.astype(jnp.int32), scores.astype(jnp.float32)

    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(spec, spec)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported_captioner(path_or_bytes) -> Callable:
    """Load a caption artifact; returns ``fn(pre, post) -> (tokens, scores)``."""
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)

    def fn(pre, post):
        return exported.call(jnp.asarray(pre, jnp.float32), jnp.asarray(post, jnp.float32))

    fn.input_shape = tuple(exported.in_avals[0].shape)
    return fn
