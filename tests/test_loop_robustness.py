"""Robustness of the host-side epoch loops on degenerate inputs.

Round-2 verdict item: with a train split smaller than the (drop_last) batch
size the epoch loop ran zero iterations and crashed on an unbound loop
variable / warned on np.mean([]). The loop must instead complete the epoch,
log a nan loss, and return cleanly.
"""

import dataclasses

import numpy as np
import pytest

from change3d_tpu.train.loop import RunConfig, run_detection_training

from tests.test_data import bcd_root  # noqa: F401  (fixture)


def test_detection_loop_survives_empty_train_loader(bcd_root, tmp_path):  # noqa: F811
    # 5 train images, global batch 8, drop_last -> zero train batches.
    cfg = RunConfig(
        task="bcd",
        dataset="tiny",
        file_root=bcd_root,
        save_dir=str(tmp_path),
        in_height=16,
        in_width=16,
        batch_size=8,
        max_epochs=1,
        num_workers=1,
        remat=False,
    )
    results = run_detection_training(cfg)  # must not raise
    assert isinstance(results, dict)


def test_logger_context_manager_closes_on_exception(tmp_path):
    from change3d_tpu.utils.logging import setup_logger

    with pytest.raises(RuntimeError):
        with setup_logger(str(tmp_path), {"a": 1}) as logger:
            assert not logger._text.closed
            raise RuntimeError("boom")
    assert logger._text.closed and logger._jsonl.closed
