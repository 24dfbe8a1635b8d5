"""Standalone evaluation (cli eval / run_detection_eval / run_caption_eval).

The reference only evaluates inside training (final best-model pass,
ref: /root/reference/scripts/train_BCD.py:360-383); the standalone command
must reproduce exactly the scores that fused pass reported, from either the
best weights or the latest orbax step.
"""

import os

import numpy as np
import pytest

from change3d_tpu.train.loop import RunConfig, run_detection_eval, run_detection_training

from tests.test_data import bcd_root  # noqa: F401  (fixture)
from tests.test_caption_loop import TINY_CFG, VOCAB, caption_root  # noqa: F401


def test_detection_standalone_eval_matches_training_report(bcd_root, tmp_path):  # noqa: F811
    cfg = RunConfig(
        task="bcd",
        dataset="tiny",
        file_root=bcd_root,
        save_dir=str(tmp_path),
        in_height=16,
        in_width=16,
        batch_size=4,
        max_epochs=2,
        num_workers=1,
        remat=False,
    )
    results = run_detection_training(cfg)
    run_dir = os.path.join(str(tmp_path), "tiny_iter_80000_lr_0.0002")
    assert os.path.isdir(os.path.join(run_dir, "best"))

    best = run_detection_eval(cfg, run_dir=run_dir, which="best")
    for k in ("F1", "IoU", "OA", "loss"):
        assert best[k] == pytest.approx(results["test_best"][k], abs=1e-6), k

    # Only epoch 1 validates in a 2-epoch run, so latest == best weights.
    latest = run_detection_eval(cfg, run_dir=run_dir, which="latest")
    assert latest["F1"] == pytest.approx(best["F1"], abs=1e-6)

    with pytest.raises(FileNotFoundError):
        run_detection_eval(cfg, run_dir=str(tmp_path / "nope"), which="latest")


def test_standalone_eval_quantized_modes(bcd_root, tmp_path):  # noqa: F811
    """--quantized eval in both scale regimes: dynamic needs nothing extra;
    static auto-calibrates on train-split batches and scores comparably."""
    import dataclasses

    cfg = RunConfig(
        task="bcd", dataset="tiny", file_root=bcd_root, save_dir=str(tmp_path),
        in_height=16, in_width=16, batch_size=4, max_epochs=2, num_workers=1,
        remat=False,
    )
    run_detection_training(cfg)
    run_dir = os.path.join(str(tmp_path), "tiny_iter_80000_lr_0.0002")

    fp32 = run_detection_eval(cfg, run_dir=run_dir, which="best")
    dyn = run_detection_eval(
        dataclasses.replace(cfg, quantized=True), run_dir=run_dir, which="best"
    )
    static = run_detection_eval(
        dataclasses.replace(cfg, quantized=True, quant_mode="static",
                            calib_batches=2),
        run_dir=run_dir, which="best",
    )
    for scores in (dyn, static):
        assert np.isfinite(scores["F1"]) and np.isfinite(scores["loss"])
        # int8 is approximate; on a tiny barely-trained model the agreement
        # bound is loose, but the scores must stay in the fp32 ballpark.
        assert abs(scores["OA"] - fp32["OA"]) < 0.2


def test_eval_cli_bcd(bcd_root, tmp_path, capsys):  # noqa: F811
    """CLI surface over an existing run dir (reuses the run from a fresh
    2-epoch training to keep compile shapes identical)."""
    import json

    from change3d_tpu.cli import main

    cfg = RunConfig(
        task="bcd", dataset="tiny", file_root=bcd_root, save_dir=str(tmp_path),
        in_height=16, in_width=16, batch_size=4, max_epochs=2, num_workers=1,
        remat=False,
    )
    run_detection_training(cfg)
    run_dir = os.path.join(str(tmp_path), "tiny_iter_80000_lr_0.0002")
    rc = main([
        "eval", "--model_task", "bcd", "--checkpoint", run_dir,
        "--file_root", bcd_root, "--in_height", "16", "--in_width", "16",
        "--batch_size", "4", "--num_workers", "1", "--json",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    scores = json.loads(out)
    assert "F1" in scores and np.isfinite(scores["F1"])


def test_caption_standalone_eval(caption_root, tmp_path, monkeypatch):  # noqa: F811
    import jax
    import jax.numpy as jnp

    from change3d_tpu.checkpoint.orbax_io import CheckpointManager
    from change3d_tpu.data.pipeline import caption_collate, make_data_loader
    from change3d_tpu.models.trainer import Change3D, Task
    from change3d_tpu.train import caption_loop
    from change3d_tpu.train.caption_loop import CaptionRunConfig, run_caption_eval
    from change3d_tpu.train.engine import create_train_state
    from change3d_tpu.train.optim import torch_adam

    model = Change3D(
        task=Task.CC, vocab_size=len(VOCAB), embed_dim=32, num_heads=4,
        num_layers=2, backbone_cfg=TINY_CFG, in_height=32, in_width=32,
    )
    monkeypatch.setattr(
        caption_loop, "build_caption_model",
        lambda cfg, vocab, in_size=256, backbone_cfg=None: model
    )

    run_dir = str(tmp_path / "run")
    ckpt = CheckpointManager(run_dir)
    from change3d_tpu.data.datasets import CaptionDataset

    loader = make_data_loader(
        "threaded", CaptionDataset(caption_root, "DS", "TRAIN"), 2,
        num_workers=1, collate=caption_collate,
    )
    sample = next(iter(loader))
    state = create_train_state(
        model, torch_adam(lambda i: 1e-3), jax.random.PRNGKey(0), sample
    )
    ckpt.save(1, state)
    ckpt.save_best(state.variables)

    cfg = CaptionRunConfig(
        file_root=caption_root, dataset="DS", eval_batch_size=2, num_workers=1,
    )
    for which in ("best", "latest"):
        scores = run_caption_eval(cfg, run_dir=run_dir, which=which, save_json=(which == "best"))
        for k in ("Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "change_acc"):
            assert np.isfinite(scores[k]), (which, k)
    assert os.path.exists(os.path.join(run_dir, "res.json"))
