"""Host-side training orchestration: the epoch loop around the jitted engine.

Replicates the reference protocol so reported metrics are comparable
(SURVEY.md §5 hard part (f)): validation runs on the *test* split every epoch
except epoch 0 (ref: /root/reference/scripts/train_BCD.py:311-317), best model
is gated on the task metric (F1 / mIoU / oaF1 / BLEU-4), and the final report
re-evaluates the best weights.
"""

from __future__ import annotations

import dataclasses
import os
import signal
import threading
import time
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from change3d_tpu.checkpoint.convert import load_x3d_pretrained, merge_backbone_variables
from change3d_tpu.checkpoint.orbax_io import CheckpointManager
from change3d_tpu.data.datasets import BCDDataset, SCDDataset, BDADataset
from change3d_tpu.data.pipeline import (
    iter_from as data_iter_from,
    make_data_loader,
    pair_collate,
    device_prefetch,
)
from change3d_tpu.data.transforms import make_transform_pipelines
from change3d_tpu.metrics.confusion import BinaryChangeMeter, SCDMeter, BDAMeter
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    multiple_of_devices,
)
from change3d_tpu.train.engine import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from change3d_tpu.train.lr import poly_warmup_schedule, step_schedule
from change3d_tpu.train.optim import torch_adam
from change3d_tpu.utils.logging import setup_logger
from change3d_tpu.utils.profiling import WindowTracer


@dataclasses.dataclass
class RunConfig:
    task: str = "bcd"
    dataset: str = "LEVIR-CD"
    file_root: str = ""
    save_dir: str = "./exp"
    in_height: int = 256
    in_width: int = 256
    num_classes: int = 1
    max_steps: int = 80_000
    max_epochs: Optional[int] = None
    batch_size: int = 16
    lr: float = 2e-4
    lr_mode: str = "poly"
    step_loss: int = 100
    weight_decay: float = 1e-4
    pretrained: Optional[str] = None
    resume: bool = False
    num_workers: int = 4
    seed: int = 16
    log_name: str = "train_val_log"
    # 'threaded' (default) or 'grain' (process-pool workers; see
    # data/grain_pipeline.py).
    loader: str = "threaded"
    compute_dtype: str = "float32"
    # jax.checkpoint over block pairs. Default ON: the batch-16 256^2 train
    # step needs 22.7 GB of activations without it — over a 16 GB v5e's HBM.
    remat: bool = True
    # Time-packed stage-1 execution (ops/packed.py): +10% eval, +5% train on
    # v5e. Off by default so default runs match the reference layout exactly;
    # numerics differ only at fp32 reduction-order level (equality-tested).
    packed: bool = False
    # Fused Pallas bottleneck blocks at eval time (stage-3 class blocks whose
    # inner tensor fits VMEM): measured 481 -> 493 pairs/s on v5e with packed
    # stage 1. Off by default for reference-exact eval numerics (differences
    # are bf16-rounding level, equality-tested to atol 2e-2 on bf16).
    fused: bool = False
    # Dynamic int8 quantization of the MXU convs at eval time (ops/quant.py).
    # Off by default: approximate numerics (decision-agreement tested); for
    # serving-throughput use via predict/eval/export and bench A/B.
    quantized: bool = False
    # 'dynamic' (on-the-fly per-sample scales) or 'static' (scales calibrated
    # on train-split batches then frozen — no hot-path reduction).
    quant_mode: str = "dynamic"
    # Train-split batches used to calibrate static scales.
    calib_batches: int = 8
    # Write a jax.profiler trace of training steps 10-14 (first epoch) here
    # for XProf/TensorBoard kernel-level timing. None = off.
    profile_dir: Optional[str] = None
    # CC-specific
    vocab_size: int = 0
    embed_dim: int = 192
    n_head: int = 8
    n_layer: int = 3
    dropout: float = 0.1
    grad_clip: Optional[float] = None
    epochs_cc: int = 200


_DATASETS = {"bcd": BCDDataset, "scd": SCDDataset, "bda": BDADataset}
_BEST_METRIC = {"bcd": "F1", "scd": "IoU_mean", "bda": "overall_f1"}


class PreemptionGuard:
    """SIGTERM → finish the in-flight step, checkpoint, exit cleanly.

    Preemptible TPU pools deliver SIGTERM with a grace window; the handler
    only sets a flag, the training loop polls it after each completed step
    and performs the (collective-safe) save itself — nothing jax-related
    happens in signal context. The previous handler is restored on exit so
    nested loops (e.g. tests) don't leak handlers. When not on the main
    thread (signal.signal raises ValueError there) the guard degrades to a
    no-op flag, keeping in-process test drivers usable.

    Test hook: ``CHANGE3D_PREEMPT_AFTER_STEP=N`` raises SIGTERM in-process
    via ``tick()`` after the Nth completed optimizer step, exercising the
    REAL signal path at a deterministic point (the kill-mid-epoch drill in
    tests/test_preemption.py relies on this for bit-exact comparisons).
    """

    def __init__(self):
        self._flag = threading.Event()
        self._prev = None
        self._installed = False
        self._hook_step = int(os.environ.get("CHANGE3D_PREEMPT_AFTER_STEP", "0") or 0)

    def __enter__(self) -> "PreemptionGuard":
        try:
            self._prev = signal.signal(signal.SIGTERM, self._on_signal)
            self._installed = True
        except ValueError:  # not the main thread
            pass
        return self

    def __exit__(self, *exc) -> None:
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev)

    def _on_signal(self, signum, frame) -> None:
        # Flag FIRST, then announce via os.write: print() in signal context
        # can raise "reentrant call inside BufferedWriter" if the signal
        # lands while the main thread holds the stdout lock (progress/epoch
        # prints), which would abort the run before the flag is set — the
        # exact failure this guard exists to prevent. os.write is
        # async-signal-safe.
        self._flag.set()
        os.write(
            2,
            b"[preempt] SIGTERM: finishing the in-flight step, then "
            b"checkpoint-and-exit (resume with --resume)\n",
        )

    def tick(self, global_step: int) -> None:
        """Arm the deterministic test hook after ``global_step`` steps."""
        if self._hook_step and global_step >= self._hook_step:
            self._hook_step = 0
            if self._installed:
                signal.raise_signal(signal.SIGTERM)
            else:
                self._flag.set()

    @property
    def triggered(self) -> bool:
        return self._flag.is_set()


def build_model(cfg: RunConfig) -> Change3D:
    import dataclasses as _dc

    from change3d_tpu.models.x3d import x3d_l_config

    backbone = None
    if cfg.remat or cfg.packed or cfg.fused or cfg.quantized:
        backbone = _dc.replace(
            x3d_l_config(),
            remat=cfg.remat,
            packed_eval_stages=(0,) if cfg.packed else (),
            packed_train=cfg.packed,
            fused_inference=cfg.fused,
            quantized_eval=cfg.quantized,
            quant_mode=cfg.quant_mode,
        )
    return Change3D(
        task=Task(cfg.task),
        num_classes=cfg.num_classes,
        in_height=cfg.in_height,
        in_width=cfg.in_width,
        vocab_size=cfg.vocab_size,
        embed_dim=cfg.embed_dim,
        num_heads=cfg.n_head,
        num_layers=cfg.n_layer,
        dropout=cfg.dropout,
        backbone_cfg=backbone,
    )


def _make_meter(task: str, num_classes: int):
    if task == "bcd":
        return BinaryChangeMeter()
    if task == "scd":
        return SCDMeter(num_classes=num_classes)
    if task == "bda":
        return BDAMeter(num_classes=num_classes)
    return None


def _update_meter(task: str, meter, metrics):
    if task == "bcd":
        meter.update(metrics["cm"])
    elif task == "scd":
        meter.update(metrics["cm"], metrics["acc_correct"], metrics["acc_total"])
    elif task == "bda":
        meter.update(metrics["loc_cm"], metrics["cls_cm"])


def _evaluate_split(cfg: RunConfig, eval_step, state, loader, bsh) -> Dict[str, float]:
    """One metered pass over an eval loader (the reference's val(),
    ref: /root/reference/scripts/train_BCD.py:92-154)."""
    meter = _make_meter(cfg.task, cfg.num_classes)
    losses = []
    for batch in device_prefetch(loader, bsh):
        # 'valid' marks padded samples in the final batch; the engine
        # masks them out of the confusion matrices on device.
        metrics = eval_step(state, batch)
        metrics = jax.device_get(metrics)
        losses.append(float(metrics.pop("loss")))
        _update_meter(cfg.task, meter, metrics)
    scores = meter.scores()
    scores["loss"] = float(np.mean(losses)) if losses else float("nan")
    return scores


def calibrate_from_train_split(cfg: RunConfig, model, variables) -> dict:
    """Static-int8 activation calibration on TRAIN-split batches (standard
    PTQ practice — never the split being scored). Returns the 'quant'
    variable collection. Calibration applies unsharded (single device), so
    ragged final batches are fine — device-rounded batch sizes must not
    starve it on small splits."""
    from change3d_tpu.inference import calibrate_quant_scales

    _, eval_tf = make_transform_pipelines(cfg.task, cfg.in_width, cfg.in_height)
    calib_data = _DATASETS[cfg.task](cfg.file_root, "train", eval_tf)
    calib_loader = make_data_loader(
        "threaded", calib_data, cfg.batch_size, shuffle=False,
        num_workers=cfg.num_workers, collate=pair_collate, drop_last=False,
    )
    batches = []
    for i, b in enumerate(calib_loader):
        if i >= cfg.calib_batches:
            break
        batches.append((b["pre"], b["post"]))
    quant = calibrate_quant_scales(model, variables, batches)
    print(f"static int8: calibrated on {len(batches)} train batches")
    return quant


def run_detection_eval(
    cfg: RunConfig,
    run_dir: Optional[str] = None,
    split: str = "test",
    which: str = "best",
) -> Dict[str, float]:
    """Standalone evaluation of a finished run — no training step involved.

    The reference only exposes evaluation fused into training (final
    best-model pass, ref: /root/reference/scripts/train_BCD.py:360-383); this
    is the detached equivalent for scoring an existing checkpoint on any
    split. ``which`` selects the metric-gated ``best`` weights (the
    reference's protocol) or the ``latest`` orbax step.
    """
    assert cfg.task in _DATASETS, cfg.task
    mesh = make_mesh()
    batch_size = multiple_of_devices(cfg.batch_size, mesh)
    cfg = dataclasses.replace(cfg, batch_size=batch_size)
    run_dir = run_dir or os.path.join(
        cfg.save_dir, f"{cfg.dataset}_iter_{cfg.max_steps}_lr_{cfg.lr}"
    )
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    _, eval_tf = make_transform_pipelines(cfg.task, cfg.in_width, cfg.in_height)
    data = _DATASETS[cfg.task](cfg.file_root, split, eval_tf)
    loader = make_data_loader(
        "threaded", data, cfg.batch_size, shuffle=False,
        num_workers=cfg.num_workers, collate=pair_collate, pad_final=True,
    )
    model = build_model(cfg)
    ckpt = CheckpointManager(run_dir)
    if which == "best":
        sample = jnp.zeros((1, cfg.in_height, cfg.in_width, 3), jnp.float32)
        template = model.init(jax.random.PRNGKey(0), sample, sample)
        variables = ckpt.restore_best(
            {"params": template["params"], "batch_stats": template.get("batch_stats", {})}
        )
    else:
        variables, step = ckpt.restore_latest_variables()
        print(f"evaluating latest checkpoint (step {step})")
    quant = None
    if cfg.quantized and cfg.quant_mode == "static":
        quant = calibrate_from_train_split(cfg, model, variables)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=None,
        quant=quant,
    )
    state = jax.device_put(state, rsh)
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    eval_step = make_eval_step(model, compute_dtype=compute_dtype)
    return _evaluate_split(cfg, eval_step, state, loader, bsh)


def run_detection_training(cfg: RunConfig) -> Dict[str, Any]:
    """BCD / SCD / BDA unified train+validate (the reference's
    trainValidate, ref: /root/reference/scripts/train_BCD.py:240-383)."""
    assert cfg.task in _DATASETS, cfg.task
    mesh = make_mesh()
    batch_size = multiple_of_devices(cfg.batch_size, mesh)
    if batch_size != cfg.batch_size:
        print(
            f"batch_size {cfg.batch_size} rounded up to {batch_size} "
            f"(must divide over {mesh.shape[DATA_AXIS]} devices)"
        )
        cfg = dataclasses.replace(cfg, batch_size=batch_size)

    save_path = os.path.join(cfg.save_dir, f"{cfg.dataset}_iter_{cfg.max_steps}_lr_{cfg.lr}")
    with setup_logger(save_path, dataclasses.asdict(cfg), cfg.log_name) as logger:
        return _run_detection(cfg, logger, save_path, mesh)


def _run_detection(cfg: RunConfig, logger, save_path: str, mesh) -> Dict[str, Any]:
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)

    train_tf, eval_tf = make_transform_pipelines(cfg.task, cfg.in_width, cfg.in_height)
    ds_cls = _DATASETS[cfg.task]
    # All tasks validate on the *test* split, including BDA: the reference
    # builds a 'hold' loader for xBD but never uses it — its val() runs on
    # test_loader ("using test set as validation",
    # ref: /root/reference/scripts/train_BDA.py:305-308).
    train_data = ds_cls(cfg.file_root, "train", train_tf)
    test_data = ds_cls(cfg.file_root, "test", eval_tf)
    # Both loader kinds support multi-host padded eval: GrainDataLoader
    # routes pad_final + num_shards>1 through its sharded-padded path
    # (grain_pipeline._sharded_padded_iter), matching the threaded loader's
    # global-position 'valid' contract — no fallback needed.
    eval_loader_kind = cfg.loader
    train_loader = make_data_loader(
        cfg.loader, train_data, cfg.batch_size, shuffle=True, seed=cfg.seed,
        num_workers=cfg.num_workers, collate=pair_collate, drop_last=True,
    )
    test_loader = make_data_loader(
        eval_loader_kind, test_data, cfg.batch_size, shuffle=False, num_workers=cfg.num_workers,
        collate=pair_collate, pad_final=True,
    )
    max_batches = max(len(train_loader), 1)
    max_epochs = cfg.max_epochs or int(np.ceil(cfg.max_steps / max_batches))

    model = build_model(cfg)
    if cfg.lr_mode == "poly":
        schedule = poly_warmup_schedule(cfg.lr, max_batches * max_epochs, max_batches)
    else:
        schedule = step_schedule(cfg.lr, max_batches, cfg.step_loss)
    tx = torch_adam(schedule, weight_decay=cfg.weight_decay)

    rng = jax.random.PRNGKey(cfg.seed)
    sample = next(iter(test_loader))
    sample.pop("valid", None)
    state = create_train_state(model, tx, rng, sample)
    if cfg.pretrained:
        backbone = load_x3d_pretrained(cfg.pretrained)
        variables = merge_backbone_variables(state.variables, backbone)
        state = state.replace(params=variables["params"], batch_stats=variables["batch_stats"])
        state = state.replace(opt_state=tx.init(state.params))
        print(f"Loaded pretrained backbone: {cfg.pretrained}")
    state = jax.device_put(state, rsh)

    ckpt = CheckpointManager(save_path)
    best_metric_name = _BEST_METRIC[cfg.task]
    best_val = -1.0
    start_epoch = 0
    resume_step = 0
    skip_batches = 0
    if cfg.resume:
        state, resume_step = ckpt.restore(state)
        # Mid-epoch checkpoints (preemption saves) resume EXACTLY: re-enter
        # the interrupted epoch and skip the batches already trained. The
        # loader's per-epoch permutation is a pure function of (seed, epoch)
        # so the skipped prefix is the prefix that was consumed — kill→resume
        # is bit-exact vs an uninterrupted run (tests/test_preemption.py).
        start_epoch = resume_step // max_batches
        skip_batches = resume_step % max_batches
        # best_val travels in the sidecar, not the jax state tree: without it
        # a resumed run restarts at -inf and can overwrite best/ with a worse
        # model (the reference has this bug — its checkpoint.pth.tar carries
        # no best_pred, ref: /root/reference/model/utils.py:205-232).
        best_val = float(ckpt.load_meta().get("best_val", -1.0))
        state = jax.device_put(state, rsh)

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    train_step = make_train_step(model, tx, compute_dtype=compute_dtype)
    eval_step = make_eval_step(model, compute_dtype=compute_dtype)
    results: Dict[str, Any] = {}

    def evaluate(state) -> Dict[str, float]:
        return _evaluate_split(cfg, eval_step, state, test_loader, bsh)

    # A SIGTERM that lands during an epoch's FINAL step preempts with
    # skip_batches == 0: the epoch trained to completion but its validation,
    # logging, and best-model gating never ran (the preempt branch saves and
    # exits first). Detect that exact boundary on resume — the sidecar pins
    # the preempt step — and run the missing evaluation now, on the restored
    # end-of-epoch state, so best/ and the logs match an uninterrupted run.
    if (
        cfg.resume
        and resume_step > 0
        and skip_batches == 0
        and int(ckpt.load_meta().get("preempted_at_step", -1)) == resume_step
        and start_epoch - 1 >= 1  # epoch 0 skips validation (reference protocol)
    ):
        done_epoch = start_epoch - 1
        print(
            f"[resume] epoch {done_epoch} completed right at the preemption "
            f"point but was never evaluated — evaluating now",
            flush=True,
        )
        scores = evaluate(state)
        logger.log_epoch(done_epoch, scores)
        print(f"[epoch {done_epoch}] val {scores}")
        if scores[best_metric_name] >= best_val:
            best_val = scores[best_metric_name]
            ckpt.save_best(state.variables)
        ckpt.save_meta({"best_val": best_val})
        results["last"] = scores

    step_rng = jax.random.PRNGKey(cfg.seed + 1)
    tracer = WindowTracer(cfg.profile_dir)
    host_step = resume_step  # host mirror of state.step: no device syncs
    with PreemptionGuard() as guard:
        for epoch in range(start_epoch, max_epochs):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            n_batches = len(train_loader)
            if epoch == start_epoch and skip_batches:
                print(
                    f"[resume] epoch {epoch}: skipping {skip_batches} "
                    f"already-trained batches (mid-epoch checkpoint)",
                    flush=True,
                )
                batch_iter = data_iter_from(train_loader, skip_batches)
            else:
                batch_iter = iter(train_loader)
            # Every step's loss accumulates into ONE device scalar (no host
            # sync — the queue stays full), so the logged epoch loss is the
            # exact every-iteration mean the reference logs
            # (ref: /root/reference/scripts/train_BCD.py:227-232). Only the
            # progress prints host-sync, every 50 iters.
            loss_sum = None  # running device-side scalar: O(1) live buffers
            n_steps = 0
            for i, batch in enumerate(device_prefetch(batch_iter, bsh)):
                tracer.tick(i)
                state, last_metrics = train_step(state, batch, step_rng)
                loss_sum = (
                    last_metrics["loss"] if loss_sum is None
                    else loss_sum + last_metrics["loss"]
                )
                n_steps += 1
                host_step += 1
                guard.tick(host_step)
                if guard.triggered:
                    break
                if i % 50 == 0 and i and n_batches:  # iteration progress + ETA
                    # (ref prints every 5 iters; 50 keeps the device queue full)
                    eta = (time.time() - t0) / (i + 1) * (n_batches - i - 1)
                    print(
                        f"  [epoch {epoch}] iter {i}/{n_batches} "
                        f"loss {float(jax.device_get(last_metrics['loss'])):.4f} "
                        f"eta {eta:.0f}s",
                        flush=True,
                    )
            tracer.close()
            if guard.triggered:
                # Durable (blocking) mid-epoch save of the FULL state —
                # params, batch_stats, optimizer, step — plus the sidecar, so
                # --resume continues from exactly this optimizer step.
                ckpt.save(host_step, state, wait=True)
                ckpt.save_meta({"best_val": best_val, "preempted_at_step": host_step})
                print(
                    f"[preempt] checkpoint saved at step {host_step}; exiting "
                    f"cleanly",
                    flush=True,
                )
                results["preempted_at_step"] = host_step
                return results
            mean_loss = (
                float(jax.device_get(loss_sum)) / n_steps if n_steps else float("nan")
            )
            print(f"[epoch {epoch}] train loss {mean_loss:.4f} ({time.time() - t0:.1f}s)")

            if epoch == 0:
                continue  # reference protocol: skip epoch-0 validation

            scores = evaluate(state)
            logger.log_epoch(epoch, scores)
            print(f"[epoch {epoch}] val {scores}")
            # Async: the epoch checkpoint's disk write overlaps the next
            # epoch's train steps (save() itself drains any prior in-flight
            # write; jax arrays are immutable so the snapshot is stable).
            ckpt.save(
                host_step, state,
                metrics={best_metric_name: scores[best_metric_name]}, wait=False,
            )
            if scores[best_metric_name] >= best_val:
                best_val = scores[best_metric_name]
                ckpt.save_best(state.variables)
            ckpt.save_meta({"best_val": best_val})
            results["last"] = scores

    ckpt.wait()  # drain the last async save before reading best/ back
    # Final: reload best weights and evaluate. Only the restore fails softly
    # (no best saved on 1-epoch smoke runs); eval errors must surface.
    best_vars = None
    try:
        best_vars = ckpt.restore_best(state.variables)
    except Exception as e:
        print(f"best-model evaluation skipped (no best checkpoint): {e}")
    if best_vars is not None:
        final_state = state.replace(params=best_vars["params"], batch_stats=best_vars["batch_stats"])
        results["test_best"] = evaluate(final_state)
        logger.log_epoch(-1, results["test_best"], split="test_best")
    return results
