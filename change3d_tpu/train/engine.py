"""Unified, task-parameterized train/eval engine.

One engine replaces the reference's four ~80%-identical scripts
(SURVEY.md §1). Everything that touches tensors lives inside two jitted
functions per task:

- ``train_step``: forward (train-mode BN), loss, grads, torch-Adam update,
  BN running-stat update, and *on-device* metric accumulation — all one XLA
  program. Under a sharded batch, GSPMD turns the gradient/metric reductions
  into ICI all-reduces; there is no host-side gradient code.
- ``eval_step``: eval-mode forward + loss + confusion matrices on device.
  Only KxK matrices and scalars are ever fetched to host.

Loss formulas replicate the reference exactly:
  BCD: BCEDice                        (ref: /root/reference/scripts/train_BCD.py:200-201)
  SCD: 0.5*(CE_pre + CE_post) + BCEDice(change) + ChangeSimilarity
       with CE ignore_index=0 and similarity over classes 1..C-1
       (ref: /root/reference/scripts/train_SCD.py:222-229,323-324)
  BDA: CE(cls = loc*cls label, ignore 0) + BCEDice(loc)
       (ref: /root/reference/scripts/train_BDA.py:179-198)
  CC:  packed-sequence CE(ignore 0) == masked CE here
       (ref: /root/reference/scripts/train_CC.py:122-132)
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import flax
import optax

from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.metrics.confusion import confusion_matrix
from change3d_tpu.train.losses import (
    bce_dice_loss,
    caption_cross_entropy,
    caption_top_k_accuracy,
    change_similarity_loss,
    cross_entropy_2d,
)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # Calibrated static-int8 activation scales ('quant' collection) — only
    # populated for quant_mode='static' evaluation (ops/quant.py).
    quant: Any = None

    @property
    def variables(self):
        v = {"params": self.params, "batch_stats": self.batch_stats}
        if self.quant is not None:
            v["quant"] = self.quant
        return v


def create_train_state(
    model: Change3D,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
) -> TrainState:
    kwargs = {}
    if model.task == Task.CC:
        kwargs["captions"] = jnp.asarray(sample_batch["caption"])
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.asarray(sample_batch["pre"]),
        jnp.asarray(sample_batch["post"]),
        **kwargs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


# ---------------------------------------------------------------------------
# Per-task loss + on-device metrics
# ---------------------------------------------------------------------------


def _valid_gt(batch, gt):
    """Mask padded eval samples out of the metric hist: gt -> -1 where the
    sample is padding (confusion_matrix ignores out-of-range gt)."""
    valid = batch.get("valid")
    if valid is None:
        return gt
    shape = (gt.shape[0],) + (1,) * (gt.ndim - 1)
    return jnp.where(valid.reshape(shape), gt, -1)


def _bcd_loss_metrics(outputs, batch, train: bool):
    probs = outputs["change"]
    label = batch["label"].astype(jnp.float32)  # [B,H,W,1]
    loss = bce_dice_loss(probs, label)
    pred = (probs > 0.5).astype(jnp.int32)
    cm = confusion_matrix(_valid_gt(batch, batch["label"]), pred, 2)
    return loss, {"cm": cm}


def _scd_loss_metrics(outputs, batch, train: bool):
    label = batch["label"]  # [B,H,W,3] int: (label1, label2, change)
    change = label[..., 2]
    pre_label = label[..., 0] * change
    post_label = label[..., 1] * change
    seg = cross_entropy_2d(outputs["pre"], pre_label, ignore_index=0) + cross_entropy_2d(
        outputs["post"], post_label, ignore_index=0
    )
    binary = bce_dice_loss(outputs["change"], change[..., None].astype(jnp.float32))
    sim = change_similarity_loss(outputs["pre"][..., 1:], outputs["post"][..., 1:], change)
    loss = 0.5 * seg + binary + sim
    num_classes = outputs["pre"].shape[-1]
    change_pred = (outputs["change"][..., 0] > 0.5).astype(jnp.int32)
    pre_pred = jnp.argmax(outputs["pre"], axis=-1).astype(jnp.int32) * change_pred
    post_pred = jnp.argmax(outputs["post"], axis=-1).astype(jnp.int32) * change_pred
    # Reference hist convention for SCD is hist[pred, label]
    # (ref: /root/reference/model/utils.py:321-328,345-353 — fast_hist's first
    # arg is the prediction); padded eval samples are masked via pred -> -1.
    pre_pr = _valid_gt(batch, pre_pred)
    post_pr = _valid_gt(batch, post_pred)
    cm = confusion_matrix(pre_pr, pre_label, num_classes) + confusion_matrix(
        post_pr, post_label, num_classes
    )
    valid_px = pre_pr >= 0
    correct = jnp.sum((pre_pred == pre_label) & valid_px) + jnp.sum(
        (post_pred == post_label) & valid_px
    )
    total = 2 * jnp.sum(valid_px)
    return loss, {"cm": cm, "acc_correct": correct, "acc_total": total}


def _bda_loss_metrics(outputs, batch, train: bool):
    label = batch["label"]  # [B,H,W,2] int: (loc, cls)
    label_loc = label[..., 0]
    label_cls = label[..., 0] * label[..., 1]  # torch.prod over channel dim
    seg = cross_entropy_2d(outputs["cls"], label_cls, ignore_index=0)
    binary = bce_dice_loss(outputs["loc"], label_loc[..., None].astype(jnp.float32))
    loss = seg + binary
    num_classes = outputs["cls"].shape[-1]
    loc_pred = (outputs["loc"][..., 0] > 0.5).astype(jnp.int32)
    loc_cm = confusion_matrix(_valid_gt(batch, jnp.minimum(label_loc, 1)), loc_pred, 2)
    cls_pred = jnp.argmax(outputs["cls"], axis=-1).astype(jnp.int32)
    # Only pixels with loc>0 count for damage classification
    # (ref: /root/reference/scripts/train_BDA.py:136-138): mask others out of
    # the hist by sending their gt out of range.
    cls_gt = _valid_gt(batch, jnp.where(label_loc > 0, label_cls, -1))
    cls_cm = confusion_matrix(cls_gt, cls_pred, num_classes)
    return loss, {"loc_cm": loc_cm, "cls_cm": cls_cm}


def _cc_loss_metrics(outputs, batch, train: bool):
    logits = outputs["logits"]
    loss = caption_cross_entropy(logits, batch["caption"], batch["length"], ignore_index=0)
    acc = caption_top_k_accuracy(logits, batch["caption"], batch["length"], k=1)
    return loss, {"top1": acc}


_TASK_FNS: Dict[Task, Callable] = {
    Task.BCD: _bcd_loss_metrics,
    Task.SCD: _scd_loss_metrics,
    Task.BDA: _bda_loss_metrics,
    Task.CC: _cc_loss_metrics,
}


def _forward(
    model: Change3D, variables, batch, *, train: bool, rngs=None, mutable=False, compute_dtype=None
):
    kwargs = {}
    if model.task == Task.CC:
        kwargs["captions"] = batch["caption"]
    pre, post = batch["pre"], batch["post"]
    if compute_dtype is not None:
        # bf16 activations: every matmul still accumulates fp32
        # (preferred_element_type) and BN statistics stay fp32; task heads
        # emit fp32 via the loss cast.
        pre = pre.astype(compute_dtype)
        post = post.astype(compute_dtype)
    return model.apply(
        variables,
        pre,
        post,
        train=train,
        rngs=rngs,
        mutable=["batch_stats"] if mutable else False,
        **kwargs,
    )


def make_train_step(
    model: Change3D,
    tx: optax.GradientTransformation,
    *,
    donate: bool = True,
    compute_dtype=None,
):
    """Returns jit(state, batch, rng) -> (state, metrics)."""
    loss_metrics = _TASK_FNS[model.task]

    def step(state: TrainState, batch, rng: jax.Array):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            outputs, updates = _forward(
                model,
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=True,
                compute_dtype=compute_dtype,
            )
            loss, metrics = loss_metrics(outputs, batch, True)
            return loss, (metrics, updates["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(metrics, loss=loss)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: Change3D, *, compute_dtype=None):
    loss_metrics = _TASK_FNS[model.task]

    def step(state: TrainState, batch):
        outputs = _forward(
            model, state.variables, batch, train=False, compute_dtype=compute_dtype
        )
        loss, metrics = loss_metrics(outputs, batch, False)
        return dict(metrics, loss=loss)

    return jax.jit(step)


def make_infer_step(model: Change3D):
    """Pure forward for serving/benchmarks: variables -> outputs."""

    def step(variables, pre, post):
        kwargs = {}
        return model.apply(variables, pre, post, train=False, **kwargs)

    return jax.jit(step)
