"""Caption pipeline end-to-end on synthetic data: HDF5 dataset -> loader ->
teacher-forced training -> batched beam decode -> metric suite."""

import json
import os

import h5py
import numpy as np
import pytest

import jax

from change3d_tpu.data.datasets import CaptionDataset
from change3d_tpu.data.pipeline import DataLoader, caption_collate
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import X3DConfig
from change3d_tpu.train.caption_loop import evaluate_captions, _EveryFifth
from change3d_tpu.train.engine import create_train_state, make_train_step
from change3d_tpu.train.lr import shrink_schedule
from change3d_tpu.train.optim import torch_adam

VOCAB = {"<pad>": 0, "<start>": 2, "<end>": 3, "<unk>": 1}
for i, w in enumerate(["a", "building", "appeared", "road", "nothing", "changed"]):
    VOCAB[w] = 4 + i

TINY_CFG = X3DConfig(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(1, 1, 2, 1),
    head_dim_out=64,
    num_classes=10,
)


@pytest.fixture(scope="module")
def caption_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cc")
    rng = np.random.RandomState(0)
    n_imgs, cpi, cap_len, hw = 4, 5, 12, 32
    for split in ("TRAIN", "TEST"):
        with h5py.File(root / f"{split}_IMAGES_DS.hdf5", "w") as f:
            f.attrs["captions_per_image"] = cpi
            f.create_dataset(
                "images", data=rng.randint(0, 255, (n_imgs, 2, 3, hw, hw), np.uint8)
            )
        caps, lens = [], []
        for _ in range(n_imgs * cpi):
            n_words = rng.randint(3, 7)
            body = rng.randint(4, 10, n_words).tolist()
            cap = [2] + body + [3]
            lens.append(len(cap))
            caps.append(cap + [0] * (cap_len - len(cap)))
        with open(root / f"{split}_CAPTIONS_DS.json", "w") as f:
            json.dump(caps, f)
        with open(root / f"{split}_CAPLENS_DS.json", "w") as f:
            json.dump(lens, f)
    with open(root / "WORDMAP_DS.json", "w") as f:
        json.dump(VOCAB, f)
    return str(root)


def test_caption_train_and_beam_eval(caption_root):
    model = Change3D(
        task=Task.CC, vocab_size=len(VOCAB), embed_dim=32, num_heads=4,
        num_layers=2, backbone_cfg=TINY_CFG, in_height=32, in_width=32,
    )
    train_data = CaptionDataset(caption_root, "DS", "TRAIN")
    loader = DataLoader(train_data, 4, shuffle=True, num_workers=1, collate=caption_collate, drop_last=True)
    batch = next(iter(loader))
    assert batch["caption"].shape[1] == 12
    assert batch["pre"].shape == (4, 32, 32, 3)

    tx = torch_adam(shrink_schedule(1e-3, 5), weight_decay=1e-5, grad_clip_value=5.0)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx, donate=False)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    eval_data = _EveryFifth(CaptionDataset(caption_root, "DS", "TEST"))
    assert len(eval_data) == 4  # one per image
    eval_loader = DataLoader(eval_data, 2, num_workers=1, collate=caption_collate, pad_final=True)
    for beam in (1, 3):
        scores = evaluate_captions(model, state.variables, eval_loader, VOCAB, beam_size=beam)
        for k in ("Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "change_acc", "nochange_acc"):
            assert k in scores, k
            assert np.isfinite(scores[k])


def test_cc_bf16_compute_dtype_changes_activations_and_trains(caption_root):
    # --compute_dtype bfloat16 must actually reach the CC forward: the encoder
    # memory comes out bf16, the train step stays finite and tracks the fp32
    # loss to bf16 rounding. (Round-2 gap: the CC path silently ignored it.)
    import jax.numpy as jnp

    from change3d_tpu.train.engine import _forward

    model = Change3D(
        task=Task.CC, vocab_size=len(VOCAB), embed_dim=32, num_heads=4,
        num_layers=2, backbone_cfg=TINY_CFG, in_height=32, in_width=32,
    )
    train_data = CaptionDataset(caption_root, "DS", "TRAIN")
    loader = DataLoader(train_data, 4, shuffle=True, num_workers=1,
                        collate=caption_collate, drop_last=True)
    batch = next(iter(loader))
    tx = torch_adam(shrink_schedule(1e-3, 5), weight_decay=1e-5, grad_clip_value=5.0)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    out = _forward(model, state.variables, batch, train=False, compute_dtype=jnp.bfloat16)
    assert out["memory"].dtype == jnp.bfloat16
    out32 = _forward(model, state.variables, batch, train=False)
    assert out32["memory"].dtype == jnp.float32

    step16 = make_train_step(model, tx, donate=False, compute_dtype=jnp.bfloat16)
    step32 = make_train_step(model, tx, donate=False)
    _, m16 = step16(state, batch, jax.random.PRNGKey(1))
    _, m32 = step32(state, batch, jax.random.PRNGKey(1))
    l16, l32 = float(m16["loss"]), float(m32["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05  # same loss to bf16 rounding
    assert l16 != l32  # but genuinely a different numeric path


def test_allgather_caption_results_roundtrip_single_process():
    """Pack/pad/unpack logic of the multi-host eval gather, exercised
    single-process (process_allgather degenerates to identity): lists must
    round-trip exactly, including empty hypotheses and ragged references."""
    from change3d_tpu.train.caption_loop import _allgather_caption_results

    hyps = [[5, 6, 7], [], [9]]
    refs = [
        [[5, 6], [7]],
        [[4, 4, 4, 4, 4]],
        [[8], [], [6, 5]],
    ]
    out_h, out_r = _allgather_caption_results(hyps, refs)
    assert out_h == hyps
    assert out_r == refs
