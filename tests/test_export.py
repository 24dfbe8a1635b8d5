"""AOT export round trip: serialize the forward, reload without model code,
compare against the live model; symbolic batch dim serves multiple sizes."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from change3d_tpu.export import export_model, load_exported
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import X3DConfig

TINY = X3DConfig(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(2, 3, 3, 2),
    head_dim_out=64,
    num_classes=10,
)


@pytest.mark.parametrize("task", [Task.BCD, Task.SCD])
def test_export_round_trip(tmp_path, task):
    model = Change3D(task=task, num_classes=4, in_height=16, in_width=16, backbone_cfg=TINY)
    rs = np.random.RandomState(0)
    pre = rs.randn(2, 16, 16, 3).astype(np.float32)
    post = rs.randn(2, 16, 16, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pre), jnp.asarray(post))

    path = str(tmp_path / f"{task.value}.stablehlo")
    export_model(model, variables, path, compute_dtype=jnp.float32, platforms=("cpu",))
    fn = load_exported(path)

    live = model.apply(variables, jnp.asarray(pre), jnp.asarray(post), train=False)
    served = fn(pre, post)
    assert set(served) == set(live)
    for k in live:
        np.testing.assert_allclose(
            np.asarray(served[k]), np.asarray(live[k], np.float32), rtol=1e-5, atol=1e-6
        )

    # Symbolic batch: the same artifact serves other batch sizes.
    pre5 = rs.randn(5, 16, 16, 3).astype(np.float32)
    post5 = rs.randn(5, 16, 16, 3).astype(np.float32)
    out5 = fn(pre5, post5)
    live5 = model.apply(variables, jnp.asarray(pre5), jnp.asarray(post5), train=False)
    for k in live5:
        np.testing.assert_allclose(
            np.asarray(out5[k]), np.asarray(live5[k], np.float32), rtol=1e-5, atol=1e-6
        )


def test_export_caption_round_trip(tmp_path):
    # Full captioning pipeline (encoder + KV-cached beam decode) as one
    # artifact; served tokens must equal the live decode.
    from change3d_tpu.export import export_caption_model, load_exported_captioner
    from change3d_tpu.train.caption_loop import make_decode_fn

    vocab = {"<pad>": 0, "<unk>": 1, "<start>": 2, "<end>": 3}
    for i, w in enumerate(["a", "road", "appeared", "nothing"]):
        vocab[w] = 4 + i
    model = Change3D(
        task=Task.CC, vocab_size=len(vocab), embed_dim=32, num_heads=2,
        num_layers=1, backbone_cfg=TINY, in_height=16, in_width=16,
    )
    rs = np.random.RandomState(0)
    pre = rs.randn(2, 16, 16, 3).astype(np.float32)
    post = rs.randn(2, 16, 16, 3).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(pre), jnp.asarray(post),
        captions=jnp.zeros((2, 4), jnp.int32),
    )

    path = str(tmp_path / "cc.stablehlo")
    export_caption_model(
        model, variables, vocab, path, beam_size=2,
        compute_dtype=jnp.float32, platforms=("cpu",),
    )
    fn = load_exported_captioner(path)
    tokens, scores = fn(pre, post)

    live_tokens, live_scores = make_decode_fn(model, 2, vocab)(
        variables, jnp.asarray(pre), jnp.asarray(post)
    )
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(live_tokens))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(live_scores), rtol=1e-5)

    # Symbolic batch: same artifact at another batch size.
    pre3 = rs.randn(3, 16, 16, 3).astype(np.float32)
    post3 = rs.randn(3, 16, 16, 3).astype(np.float32)
    t3, _ = fn(pre3, post3)
    lt3, _ = make_decode_fn(model, 2, vocab)(variables, jnp.asarray(pre3), jnp.asarray(post3))
    np.testing.assert_array_equal(np.asarray(t3), np.asarray(lt3))


def test_artifact_predictor_matches_live(tmp_path):
    """ArtifactPredictor (the serving wrapper): geometry read from the
    artifact's avals, predictions equal the live Predictor; pinned-batch
    artifacts expose fixed_batch."""
    from change3d_tpu.inference import ArtifactPredictor, Predictor
    from change3d_tpu.models.trainer import Task

    model = Change3D(task=Task.BCD, num_classes=1, in_height=16, in_width=16,
                     backbone_cfg=TINY)
    rs = np.random.RandomState(1)
    pre = rs.randn(2, 16, 16, 3).astype(np.float32)
    post = rs.randn(2, 16, 16, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pre), jnp.asarray(post))

    path = str(tmp_path / "bcd.stablehlo")
    export_model(model, variables, path, compute_dtype=jnp.float32, platforms=("cpu",))
    ap = ArtifactPredictor(path)
    assert (ap.model.in_height, ap.model.in_width) == (16, 16)
    assert ap.fixed_batch is None  # symbolic batch

    live = Predictor(model, variables, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(
        ap.predict(pre, post)["change"], live.predict(pre, post)["change"]
    )

    pinned = str(tmp_path / "bcd4.stablehlo")
    export_model(model, variables, pinned, compute_dtype=jnp.float32,
                 platforms=("cpu",), batch=4)
    assert ArtifactPredictor(pinned).fixed_batch == 4


def test_export_packed_backbone(tmp_path):
    # The production eval config (packed stage 1) must export identically.
    cfg = dataclasses.replace(TINY, packed_eval_stages=(0,))
    model = Change3D(task=Task.BCD, in_height=16, in_width=16, backbone_cfg=cfg)
    rs = np.random.RandomState(1)
    pre = rs.randn(3, 16, 16, 3).astype(np.float32)
    post = rs.randn(3, 16, 16, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pre), jnp.asarray(post))
    blob = export_model(model, variables, compute_dtype=jnp.float32, platforms=("cpu",))
    fn = load_exported(blob)
    live = model.apply(variables, jnp.asarray(pre), jnp.asarray(post), train=False)
    np.testing.assert_allclose(
        np.asarray(fn(pre, post)["change"]), np.asarray(live["change"], np.float32),
        rtol=1e-5, atol=1e-6,
    )
