"""Shared tiny-CC helpers for the multi-process caption-eval test.

Mirrors tests/_tiny_bcd.py: both the parent pytest process and the spawned
jax.distributed workers import this module against the same on-disk dataset.
``caption_eval_scores`` builds a deterministic tiny CC model (fixed PRNG →
identical params on every host) and runs the full beam-decode + metric-suite
evaluation over the auto-process-sharded TEST view; under two processes the
scores must match the single-process run, proving the multi-host caption
eval path (slice decode + _allgather_caption_results reconstruction).
"""

import json
import os

import numpy as np

VOCAB = {"<pad>": 0, "<unk>": 1, "<start>": 2, "<end>": 3}
for _i, _w in enumerate(["a", "building", "appeared", "road", "nothing", "changed"]):
    VOCAB[_w] = 4 + _i

TINY_KW = dict(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(1, 1, 2, 1),
    head_dim_out=64,
    num_classes=10,
)


def write_caption_dataset(root, n_imgs=4, cpi=5, cap_len=12, hw=32):
    import h5py

    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    for split in ("TRAIN", "TEST"):
        with h5py.File(os.path.join(root, f"{split}_IMAGES_DS.hdf5"), "w") as f:
            f.attrs["captions_per_image"] = cpi
            f.create_dataset(
                "images", data=rng.randint(0, 255, (n_imgs, 2, 3, hw, hw), np.uint8)
            )
        caps, lens = [], []
        for _ in range(n_imgs * cpi):
            n_words = rng.randint(3, 7)
            body = rng.randint(4, len(VOCAB), n_words).tolist()
            cap = [2] + body + [3]
            lens.append(len(cap))
            caps.append(cap + [0] * (cap_len - len(cap)))
        with open(os.path.join(root, f"{split}_CAPTIONS_DS.json"), "w") as f:
            json.dump(caps, f)
        with open(os.path.join(root, f"{split}_CAPLENS_DS.json"), "w") as f:
            json.dump(lens, f)
    with open(os.path.join(root, "WORDMAP_DS.json"), "w") as f:
        json.dump(VOCAB, f)


def caption_eval_scores(root, eval_batch=4, beam_size=2):
    import jax
    import jax.numpy as jnp

    from change3d_tpu.data.datasets import CaptionDataset
    from change3d_tpu.data.pipeline import caption_collate, make_data_loader
    from change3d_tpu.models.trainer import Change3D, Task
    from change3d_tpu.models.x3d import X3DConfig
    from change3d_tpu.train.caption_loop import _EveryFifth, evaluate_captions

    model = Change3D(
        task=Task.CC, vocab_size=len(VOCAB), embed_dim=32, num_heads=4,
        num_layers=1, backbone_cfg=X3DConfig(**TINY_KW), in_height=32, in_width=32,
    )
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x, x, captions=jnp.zeros((1, 4), jnp.int32)
    )
    data = _EveryFifth(CaptionDataset(root, "DS", "TEST"))
    # make_data_loader auto-shards by process: each host decodes its slice
    # of every global batch.
    loader = make_data_loader(
        "threaded", data, eval_batch, shuffle=False, num_workers=1,
        collate=caption_collate, pad_final=True,
    )
    return evaluate_captions(model, variables, loader, VOCAB, beam_size=beam_size)
