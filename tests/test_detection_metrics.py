"""Detection-metric parity vs the reference's numpy implementations
(imported read-only from /root/reference as golden oracles)."""

import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from change3d_tpu.metrics.confusion import (
    confusion_matrix,
    binary_change_scores,
    scd_scores,
    bda_scores,
    BinaryChangeMeter,
)


def test_confusion_matrix_matches_bincount():
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 2, (4, 16, 16))
    pred = rng.randint(0, 2, (4, 16, 16))
    cm = np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), 2))
    ref = np.bincount(2 * gt.flatten() + pred.flatten(), minlength=4).reshape(2, 2)
    np.testing.assert_array_equal(cm, ref)


def test_confusion_matrix_ignores_out_of_range_gt():
    gt = np.array([0, 1, -1, 5, 1])
    pred = np.array([0, 1, 1, 1, 0])
    cm = np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), 2))
    assert cm.sum() == 3  # -1 and 5 ignored


def test_binary_scores_match_reference_cm2score():
    from utils.metric_tool import cm2score

    rng = np.random.RandomState(1)
    cm = rng.randint(0, 1000, (2, 2)).astype(np.float64)
    ref = cm2score(cm)
    got = binary_change_scores(cm)
    for k in ("Kappa", "IoU", "F1", "OA", "recall", "precision"):
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-10, err_msg=k)


def test_binary_meter_matches_reference_meter():
    from utils.metric_tool import ConfuseMatrixMeter

    rng = np.random.RandomState(2)
    ref_meter = ConfuseMatrixMeter(n_class=2)
    meter = BinaryChangeMeter()
    for _ in range(3):
        gt = rng.randint(0, 2, (2, 8, 8))
        pred = rng.randint(0, 2, (2, 8, 8))
        ref_meter.update_cm(pr=pred, gt=gt)
        meter.update(np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), 2)))
    ref = ref_meter.get_scores()
    got = meter.scores()
    for k in ("Kappa", "IoU", "F1", "OA"):
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-10, err_msg=k)


def test_scd_scores_match_reference_scdd_eval():
    from model.utils import SCDD_eval_all

    rng = np.random.RandomState(3)
    n_cls = 6
    preds = [rng.randint(0, n_cls, (16, 16)) for _ in range(4)]
    labels = [rng.randint(0, n_cls, (16, 16)) for _ in range(4)]
    ref_fscd, ref_miou, ref_sek = SCDD_eval_all(preds, labels, n_cls)

    cm = np.zeros((n_cls, n_cls))
    for p, l in zip(preds, labels):
        # reference hist convention: rows indexed by prediction via
        # fast_hist(a=pred_flat? see model/utils.py:345-353 — it calls
        # get_hist(infer_array, label_array) with fast_hist(a=image=pred).
        cm += np.asarray(confusion_matrix(jnp.asarray(p), jnp.asarray(l), n_cls))
    got = scd_scores(cm)
    np.testing.assert_allclose(got["Fscd"], ref_fscd, rtol=1e-10)
    np.testing.assert_allclose(got["IoU_mean"], ref_miou, rtol=1e-10)
    np.testing.assert_allclose(got["Sek"], ref_sek, rtol=1e-10)


def test_bda_scores_match_reference_evaluator():
    from model.utils import Evaluator

    rng = np.random.RandomState(4)
    n_cls = 5
    ev_loc, ev_cls = Evaluator(2), Evaluator(n_cls)
    loc_cm = np.zeros((2, 2))
    cls_cm = np.zeros((n_cls, n_cls))
    for _ in range(3):
        gt_loc = rng.randint(0, 2, (2, 16, 16))
        pr_loc = rng.randint(0, 2, (2, 16, 16))
        gt_cls = rng.randint(0, n_cls, (2, 16, 16))
        pr_cls = rng.randint(0, n_cls, (2, 16, 16))
        ev_loc.add_batch(gt_loc, pr_loc)
        loc_cm += np.asarray(confusion_matrix(jnp.asarray(gt_loc), jnp.asarray(pr_loc), 2))
        mask = gt_loc > 0
        ev_cls.add_batch(gt_cls[mask], pr_cls[mask])
        masked_gt = np.where(gt_loc > 0, gt_cls, -1)
        cls_cm += np.asarray(confusion_matrix(jnp.asarray(masked_gt), jnp.asarray(pr_cls), n_cls))
    ref_loc_f1 = ev_loc.Pixel_F1_score()
    ref_dmg = ev_cls.Damage_F1_socore()
    ref_harm = len(ref_dmg) / np.sum(1.0 / ref_dmg)
    got = bda_scores(loc_cm, cls_cm)
    np.testing.assert_allclose(got["loc_f1"], ref_loc_f1, rtol=1e-9)
    np.testing.assert_allclose(got["harmonic_mean_f1"], ref_harm, rtol=1e-6)
    np.testing.assert_allclose(got["overall_f1"], 0.3 * ref_loc_f1 + 0.7 * ref_harm, rtol=1e-6)
