"""Command-line entry point: one CLI for all four tasks.

Replaces the reference's four argparse scripts
(ref: /root/reference/scripts/train_{BCD,SCD,BDA,CC}.py) with subcommands that
share the engine. Flag names and defaults mirror the reference
(ref: /root/reference/scripts/train_BCD.py:387-485 etc.) so invocations port
over mechanically:

  python -m change3d_tpu.cli bcd --dataset LEVIR-CD --file_root ... \
      --pretrained X3D_L.pyth
  python -m change3d_tpu.cli scd --dataset SECOND --num_class 6 ...
  python -m change3d_tpu.cli bda --dataset xBD --num_class 5 ...
  python -m change3d_tpu.cli cc  --dataset LEVIR_CC_... --file_root ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from change3d_tpu.train.loop import RunConfig, run_detection_training


def _common_flags(p: argparse.ArgumentParser):
    p.add_argument("--file_root", required=True, help="dataset root directory")
    p.add_argument("--in_height", type=int, default=256)
    p.add_argument("--in_width", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr_mode", default="poly", choices=["poly", "step"])
    p.add_argument("--step_loss", type=int, default=100)
    p.add_argument("--pretrained", default=None, help="path to X3D_L.pyth")
    p.add_argument("--save_dir", default="./exp")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=16)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--compute_dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument(
        "--loader", default="threaded", choices=["threaded", "grain"],
        help="input pipeline: 'threaded' (in-process worker threads, default) "
        "or 'grain' (grain.python process-pool workers)",
    )
    # Multi-host launch (one command per host): jax.distributed init happens
    # before any JAX usage; loaders then auto-shard the sample index space by
    # process and shard_batch assembles global arrays (data/pipeline.py).
    p.add_argument(
        "--coordinator_address", default=None,
        help="host:port of process 0 for multi-host training "
        "(jax.distributed.initialize); single-host runs leave this unset",
    )
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument(
        "--remat", action=argparse.BooleanOptionalAction, default=True,
        help="rematerialize block pairs (default on: batch-16 256^2 training "
        "exceeds 16GB HBM without it)",
    )
    p.add_argument(
        "--packed", action=argparse.BooleanOptionalAction, default=False,
        help="time-packed stage-1 execution (+10%% eval, +5%% train on v5e; "
        "fp32 reduction-order-level numeric difference). Default ON for "
        "detection tasks (bf16+packed overfit proofs green, BENCH_TRAIN.json)",
    )
    p.add_argument(
        "--fused", action="store_true",
        help="fused Pallas bottleneck blocks for eval/validation forwards "
        "(stage 3 at 256^2; +2.5%% eval on v5e at batch 64, slightly negative "
        "at batch 128; bf16-rounding-level numeric difference)",
    )
    p.add_argument(
        "--profile_dir", default=None,
        help="write a jax.profiler trace of training steps 10-14 here "
        "(XProf/TensorBoard kernel-level timing)",
    )
    p.add_argument(
        "--platform", default=None, choices=["cpu"],
        help="force a JAX platform (default: the environment's, usually the "
        "TPU). 'cpu' runs the identical program on the host — useful for "
        "smoke runs and when the TPU link is unavailable",
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("change3d_tpu")
    sub = parser.add_subparsers(dest="task", required=True)

    # Detection defaults: bf16 activations + packed stage 1 (3.48x train
    # throughput over fp32 unpacked, BENCH_TRAIN.json; fp32
    # accumulation/statistics; overfit proofs green under both). Opt out
    # with --compute_dtype float32 / --no-packed.
    bcd = sub.add_parser("bcd", help="binary change detection")
    _common_flags(bcd)
    bcd.add_argument("--dataset", default="LEVIR-CD")
    bcd.add_argument("--num_class", type=int, default=1)
    bcd.add_argument("--max_steps", type=int, default=80_000)
    bcd.set_defaults(compute_dtype="bfloat16", packed=True)

    scd = sub.add_parser("scd", help="semantic change detection")
    _common_flags(scd)
    scd.add_argument("--dataset", default="SECOND")
    scd.add_argument("--num_class", type=int, default=6)
    scd.add_argument("--max_steps", type=int, default=80_000)
    scd.set_defaults(batch_size=8, compute_dtype="bfloat16", packed=True)

    bda = sub.add_parser("bda", help="building damage assessment")
    _common_flags(bda)
    bda.add_argument("--dataset", default="xBD")
    bda.add_argument("--num_class", type=int, default=5)
    bda.add_argument("--max_steps", type=int, default=200_000)
    bda.set_defaults(batch_size=12, compute_dtype="bfloat16", packed=True)

    cc = sub.add_parser("cc", help="change captioning")
    _common_flags(cc)
    cc.add_argument("--dataset", default="LEVIR_CC_5_cap_per_img_5_min_word_freq")
    cc.add_argument("--word_map", default=None, help="WORDMAP json (default: <root>/WORDMAP_<ds>.json)")
    cc.add_argument("--epochs", type=int, default=200)
    cc.add_argument("--embed_dim", type=int, default=192)
    cc.add_argument("--n_head", type=int, default=8)
    cc.add_argument("--n_layer", type=int, default=3)
    cc.add_argument("--dropout", type=float, default=0.1)
    cc.add_argument("--grad_clip", type=float, default=5.0)
    cc.add_argument("--beam_size", type=int, default=1)
    cc.add_argument(
        "--eval_batch_size", type=int, default=None,
        help="decode batch size for per-epoch eval (default: config default)",
    )
    cc.add_argument(
        "--encoder_lr", type=float, default=None,
        help="separate encoder learning rate (ref --encoder_lr, default: same "
        "as --lr, which plays the reference's --decoder_lr role)",
    )
    cc.add_argument(
        "--fine_tune_encoder", action=argparse.BooleanOptionalAction, default=True,
        help="fine-tune the X3D encoder (--no-fine_tune_encoder freezes it; "
        "ref: train_CC.py:439-455,643)",
    )
    cc.set_defaults(batch_size=32, lr=1e-4)

    pred = sub.add_parser(
        "predict",
        help="batch inference: write masks (bcd/scd/bda) or captions (cc) for a split",
    )
    pred.add_argument("--model_task", required=True, choices=["bcd", "scd", "bda", "cc"])
    pred.add_argument("--checkpoint", required=True, help="experiment dir containing best/")
    pred.add_argument("--file_root", required=True)
    pred.add_argument("--split", default="test")
    pred.add_argument("--out", required=True, help="output directory (PNG masks / captions.json)")
    pred.add_argument("--num_class", type=int, default=1)
    pred.add_argument("--in_height", type=int, default=256)
    pred.add_argument("--in_width", type=int, default=256)
    pred.add_argument("--batch_size", type=int, default=16)
    # cc-only predict flags
    pred.add_argument("--dataset", default="LEVIR_CC_5_cap_per_img_5_min_word_freq")
    pred.add_argument("--word_map", default=None)
    pred.add_argument("--beam_size", type=int, default=1)
    pred.add_argument("--embed_dim", type=int, default=192)
    pred.add_argument("--n_head", type=int, default=8)
    pred.add_argument("--n_layer", type=int, default=3)
    pred.add_argument("--platform", default=None, choices=["cpu"],
                      help="force a JAX platform (e.g. cpu when no TPU link)")
    pred.add_argument("--tiled", action="store_true",
                      help="full-scene mode: slide the model's fixed window "
                      "over native-resolution images and blend overlaps "
                      "(detection tasks only)")
    pred.add_argument("--tile_overlap", type=int, default=32,
                      help="overlap in px between adjacent tiles (--tiled)")
    pred.add_argument("--quantized", action="store_true",
                      help="int8 MXU convs (serving-grade approximate "
                      "numerics; detection tasks)")
    pred.add_argument("--quant_mode", default="dynamic", choices=["dynamic", "static"])
    pred.add_argument("--calib_batches", type=int, default=8)
    pred.add_argument("--shard", action="store_true",
                      help="spread each batch over all local devices "
                      "(detection tasks; batch_size must be a multiple of "
                      "the device count)")

    exp = sub.add_parser(
        "export",
        help="AOT-export a trained model to a portable StableHLO artifact "
        "(weights baked in, symbolic batch; serve with "
        "change3d_tpu.export.load_exported / load_exported_captioner). For "
        "cc the artifact contains the full encoder + KV-cached beam decode",
    )
    exp.add_argument("--model_task", required=True, choices=["bcd", "scd", "bda", "cc"])
    exp.add_argument("--checkpoint", required=True, help="experiment dir containing best/")
    exp.add_argument("--out", required=True, help="output artifact path")
    exp.add_argument("--num_class", type=int, default=1)
    exp.add_argument("--in_height", type=int, default=256)
    exp.add_argument("--in_width", type=int, default=256)
    exp.add_argument("--platforms", default="cpu,tpu")
    exp.add_argument("--batch", type=int, default=None,
                     help="pin the batch dim (default: symbolic, any batch)")
    exp.add_argument("--quantized", action="store_true",
                     help="bake int8 MXU convs into the artifact "
                     "(detection tasks)")
    exp.add_argument("--quant_mode", default="dynamic", choices=["dynamic", "static"],
                     help="static: calibrate activation scales on train-split "
                     "batches (--file_root required) and bake them in — no "
                     "runtime reductions in the served program")
    exp.add_argument("--calib_batches", type=int, default=8)
    exp.add_argument("--calib_batch_size", type=int, default=8)
    exp.add_argument("--platform", default=None, choices=["cpu"],
                     help="force the SESSION's JAX platform (export only "
                     "lowers, any platform can emit any --platforms targets; "
                     "use cpu when no TPU link)")
    # cc-only export flags
    exp.add_argument("--file_root", default=None, help="(cc) dataset root for the word map")
    exp.add_argument("--dataset", default="LEVIR_CC_5_cap_per_img_5_min_word_freq")
    exp.add_argument("--word_map", default=None)
    exp.add_argument("--beam_size", type=int, default=1)
    exp.add_argument("--embed_dim", type=int, default=192)
    exp.add_argument("--n_head", type=int, default=8)
    exp.add_argument("--n_layer", type=int, default=3)

    srv = sub.add_parser(
        "serve",
        help="HTTP batching prediction service for a trained detection run "
        "or an exported artifact (POST /v1/predict, GET /healthz)",
    )
    srv.add_argument("--model_task", required=True, choices=["bcd", "scd", "bda", "cc"])
    src = srv.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="experiment dir containing best/")
    src.add_argument("--artifact", help="exported StableHLO artifact (cli export)")
    srv.add_argument("--num_class", type=int, default=1)
    # cc-only serve flags
    srv.add_argument("--file_root", default=None, help="(cc) dataset root for the word map")
    srv.add_argument("--dataset", default="LEVIR_CC_5_cap_per_img_5_min_word_freq")
    srv.add_argument("--word_map", default=None)
    srv.add_argument("--beam_size", type=int, default=1)
    srv.add_argument("--embed_dim", type=int, default=192)
    srv.add_argument("--n_head", type=int, default=8)
    srv.add_argument("--n_layer", type=int, default=3)
    srv.add_argument("--in_height", type=int, default=256)
    srv.add_argument("--in_width", type=int, default=256)
    srv.add_argument("--batch_size", type=int, default=16,
                     help="max device batch: requests are gathered up to "
                     "this and padded to the smallest compiled bucket")
    srv.add_argument("--buckets", default=None,
                     help="comma-separated batching bucket sizes (largest "
                     "must equal --batch_size); default: a 1/4,1/2,1 ladder "
                     "for detection, single-bucket for cc/artifacts")
    srv.add_argument("--max_delay_ms", type=float, default=10.0,
                     help="max wait for batch stragglers after the first "
                     "request arrives")
    srv.add_argument("--host", default="0.0.0.0")
    srv.add_argument("--port", type=int, default=8000)
    srv.add_argument("--tiled", action="store_true",
                     help="serve native-resolution scenes (sliding window + "
                     "blend; per-request, no cross-request batching)")
    srv.add_argument("--tile_overlap", type=int, default=32)
    srv.add_argument("--packed", action=argparse.BooleanOptionalAction, default=False)
    srv.add_argument("--fused", action="store_true")
    srv.add_argument("--quantized", action="store_true")
    srv.add_argument("--platform", default=None, choices=["cpu"],
                     help="force a JAX platform (e.g. cpu when no TPU link)")
    srv.add_argument("--shard", action="store_true",
                     help="spread each served batch over all local devices "
                     "(1-D data mesh, params replicated); --batch_size must "
                     "be a multiple of the device count")
    srv.add_argument("--no_warmup", action="store_true",
                     help="skip the startup dummy batch (the first real "
                     "request then pays the cold XLA compile)")

    info = sub.add_parser(
        "info",
        help="report parameter counts and XLA-measured FLOPs for a task "
        "model, next to the reference's published efficiency numbers",
    )
    info.add_argument("--model_task", required=True, choices=["bcd", "scd", "bda", "cc"])
    info.add_argument("--num_class", type=int, default=None)
    info.add_argument("--in_height", type=int, default=256)
    info.add_argument("--in_width", type=int, default=256)
    info.add_argument("--vocab_size", type=int, default=500)
    info.add_argument("--embed_dim", type=int, default=192)
    info.add_argument("--n_head", type=int, default=8)
    info.add_argument("--n_layer", type=int, default=3)
    info.add_argument("--json", action="store_true", help="emit the report as JSON")

    ev = sub.add_parser(
        "eval",
        help="standalone evaluation of a saved run: restore its weights "
        "(best or latest) and score any split — the reference only offers "
        "this fused into training",
    )
    ev.add_argument("--model_task", required=True, choices=["bcd", "scd", "bda", "cc"])
    ev.add_argument(
        "--checkpoint", required=True,
        help="run dir holding ckpt/ and best/ "
        "({save_dir}/{dataset}_iter_{steps}_lr_{lr} or {save_dir}/{dataset}_cc_lr_{lr})",
    )
    ev.add_argument("--file_root", required=True)
    ev.add_argument("--dataset", default=None, help="dataset name (CC: HDF5 file prefix)")
    ev.add_argument(
        "--split", default=None,
        help="dataset split (default: test; CC: TEST)",
    )
    ev.add_argument(
        "--which", default="best", choices=["best", "latest"],
        help="'best' = metric-gated best weights (reference protocol); "
        "'latest' = newest orbax step",
    )
    ev.add_argument("--num_class", type=int, default=None)
    ev.add_argument("--in_height", type=int, default=256)
    ev.add_argument("--in_width", type=int, default=256)
    ev.add_argument("--batch_size", type=int, default=16)
    ev.add_argument("--num_workers", type=int, default=4)
    ev.add_argument("--compute_dtype", default="float32", choices=["float32", "bfloat16"])
    ev.add_argument("--packed", action=argparse.BooleanOptionalAction, default=False)
    ev.add_argument("--fused", action="store_true")
    ev.add_argument("--quantized", action="store_true",
                    help="int8 MXU convs (serving-grade approximate "
                    "numerics; see ops/quant.py)")
    ev.add_argument("--quant_mode", default="dynamic", choices=["dynamic", "static"],
                    help="int8 activation scales: on-the-fly per-sample, or "
                    "calibrated on train-split batches then frozen")
    ev.add_argument("--calib_batches", type=int, default=8,
                    help="train batches used for static calibration")
    ev.add_argument("--json", action="store_true", help="emit scores as JSON")
    # CC-specific
    ev.add_argument("--word_map", default=None)
    ev.add_argument("--beam_size", type=int, default=1)
    ev.add_argument("--embed_dim", type=int, default=192)
    ev.add_argument("--n_head", type=int, default=8)
    ev.add_argument("--n_layer", type=int, default=3)
    ev.add_argument("--save_json", action="store_true",
                    help="CC: also write res.json/gts.json under the run dir")
    ev.add_argument("--platform", default=None, choices=["cpu"],
                    help="force a JAX platform (e.g. cpu when no TPU link)")

    cr = sub.add_parser(
        "convert-reference",
        help="migrate a model TRAINED with the reference: convert its "
        "best_model.pth / checkpoint.pth.tar into an orbax best/ dir that "
        "eval, predict and export consume directly",
    )
    cr.add_argument("--model_task", required=True, choices=["bcd", "scd", "bda", "cc"])
    cr.add_argument("--torch_checkpoint", required=True,
                    help="best_model.pth (weights-only) or checkpoint.pth.tar")
    cr.add_argument("--out", required=True,
                    help="run dir to create ({out}/best/ is written)")
    cr.add_argument("--num_class", type=int, default=None,
                    help="inferred from the checkpoint when omitted")
    cr.add_argument("--in_height", type=int, default=256)
    cr.add_argument("--in_width", type=int, default=256)
    cr.add_argument("--n_head", type=int, default=8,
                    help="CC only; not recoverable from the weights")

    vc = sub.add_parser(
        "verify-checkpoint",
        help="strict-convert a real X3D_L.pyth, run a per-block forward on a "
        "canonical probe, and (with --trace) compare against a torch trace "
        "recorded by tools/record_torch_trace.py",
    )
    vc.add_argument("--pretrained", required=True, help="path to X3D_L.pyth")
    vc.add_argument("--trace", default=None, help="ref_acts.npz from tools/record_torch_trace.py")
    vc.add_argument("--report", default=None, help="write the report as JSON here")
    vc.add_argument("--frames", type=int, default=3)
    vc.add_argument("--height", type=int, default=64)
    vc.add_argument("--width", type=int, default=64)
    vc.add_argument("--seed", type=int, default=0)
    vc.add_argument("--rtol", type=float, default=None)
    vc.add_argument("--atol", type=float, default=None)
    vc.add_argument("--platform", default=None, choices=["cpu"],
                    help="force a JAX platform (e.g. cpu when no TPU link)")
    return parser


def run_verify_checkpoint(args) -> int:
    import json

    from change3d_tpu.checkpoint.verify import (
        DEFAULT_ATOL,
        DEFAULT_RTOL,
        format_report,
        verify_checkpoint,
    )

    report = verify_checkpoint(
        args.pretrained,
        args.trace,
        t=args.frames,
        h=args.height,
        w=args.width,
        seed=args.seed,
        rtol=args.rtol if args.rtol is not None else DEFAULT_RTOL,
        atol=args.atol if args.atol is not None else DEFAULT_ATOL,
    )
    print(format_report(report))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)
    return 0 if report["all_pass"] in (True, None) else 1


def run_eval(args) -> int:
    import json

    if args.model_task == "cc":
        from change3d_tpu.train.caption_loop import CaptionRunConfig, run_caption_eval

        cfg = CaptionRunConfig(
            file_root=args.file_root,
            word_map=args.word_map,
            embed_dim=args.embed_dim,
            n_head=args.n_head,
            n_layer=args.n_layer,
            beam_size=args.beam_size,
            eval_batch_size=args.batch_size,
            num_workers=args.num_workers,
        )
        if args.dataset:
            cfg = dataclasses.replace(cfg, dataset=args.dataset)
        backbone = None
        if args.packed or args.fused or args.quantized:
            import dataclasses as _dc

            from change3d_tpu.models.x3d import x3d_l_config

            if args.quantized and args.quant_mode == "static":
                raise SystemExit(
                    "cc eval supports dynamic int8 only (static calibration "
                    "is wired for the detection tasks)"
                )
            backbone = _dc.replace(
                x3d_l_config(),
                packed_eval_stages=(0,) if args.packed else (),
                fused_inference=args.fused,
                quantized_eval=args.quantized,
            )
        scores = run_caption_eval(
            cfg, run_dir=args.checkpoint, split=args.split, which=args.which,
            save_json=args.save_json, backbone_cfg=backbone,
        )
    else:
        from change3d_tpu.train.loop import run_detection_eval

        num_class = args.num_class
        if num_class is None:
            num_class = {"bcd": 1, "scd": 6, "bda": 5}[args.model_task]
        cfg = RunConfig(
            task=args.model_task,
            file_root=args.file_root,
            num_classes=num_class,
            in_height=args.in_height,
            in_width=args.in_width,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            compute_dtype=args.compute_dtype,
            packed=args.packed,
            fused=args.fused,
            quantized=args.quantized,
            quant_mode=args.quant_mode,
            calib_batches=args.calib_batches,
        )
        scores = run_detection_eval(
            cfg, run_dir=args.checkpoint, split=args.split or "test",
            which=args.which,
        )
    if args.json:
        print(json.dumps(scores))
    else:
        for k, v in scores.items():
            print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")
    return 0


def run_convert_reference(args) -> int:
    """Convert a reference-trained Trainer checkpoint into an orbax best/
    dir. Task geometry (num_class, vocab/embed/n_layer for CC) is inferred
    from the weights themselves where possible."""
    import torch

    import jax

    # Conversion is host-only work (the template comes from eval_shape, no
    # forward runs): pin the CPU platform so it never waits on a TPU tunnel.
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from change3d_tpu.checkpoint.convert import convert_trainer_state_dict
    from change3d_tpu.checkpoint.orbax_io import CheckpointManager
    from change3d_tpu.models.trainer import Change3D, Task

    ckpt = torch.load(args.torch_checkpoint, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    state = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state.items()}

    kw = {}
    num_class = args.num_class
    if args.model_task == "cc":
        vocab, embed = state["decoder.vocab_embedding.weight"].shape
        n_layer = 1 + max(
            int(k.split(".")[2]) for k in state if k.startswith("decoder.transformer.layers.")
        )
        kw = dict(vocab_size=vocab, embed_dim=embed, num_heads=args.n_head, num_layers=n_layer)
        num_class = 1
        print(f"inferred: vocab_size={vocab} embed_dim={embed} n_layer={n_layer}")
    elif num_class is None:
        probe = {"bcd": "decoder", "scd": "decoder_pre", "bda": "decoder_cls"}[args.model_task]
        num_class = state[f"{probe}.up_c1.0.weight"].shape[0]
        print(f"inferred: num_class={num_class}")

    model = Change3D(
        task=Task(args.model_task), num_classes=num_class,
        in_height=args.in_height, in_width=args.in_width, **kw,
    )
    sample = jnp.zeros((1, args.in_height, args.in_width, 3), jnp.float32)
    init_kw = {"captions": jnp.zeros((1, 4), jnp.int32)} if args.model_task == "cc" else {}
    # Structure/shapes only — eval_shape traces init without running the
    # (expensive, device-touching) full-resolution forward.
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), sample, sample, **init_kw)
    )
    variables = convert_trainer_state_dict(
        state,
        {"params": template["params"], "batch_stats": template.get("batch_stats", {})},
    )
    CheckpointManager(args.out).save_best(variables)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"converted {n:,} params -> {args.out}/best (use with "
          f"'eval/predict/export --checkpoint {args.out}')")
    return 0


def run_info(args) -> int:
    import json

    # The report is a property of the traced program (eval_shape + abstract
    # lowering), not of any chip: pin the CPU platform so it never waits on
    # a TPU link.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from change3d_tpu.utils.model_info import format_info, model_info

    report = model_info(
        args.model_task,
        num_classes=args.num_class,
        in_height=args.in_height,
        in_width=args.in_width,
        vocab_size=args.vocab_size,
        embed_dim=args.embed_dim,
        n_head=args.n_head,
        n_layer=args.n_layer,
    )
    print(json.dumps(report) if args.json else format_info(report))
    return 0


def _cc_config_and_word_map(args):
    """Shared cc setup for export/serve: word-map discovery + run config."""
    from change3d_tpu.train.caption_loop import CaptionRunConfig, load_word_map

    if not (args.file_root or args.word_map):
        raise SystemExit(
            f"cc {args.task} needs --word_map (or --file_root to find it)"
        )
    ccfg = CaptionRunConfig(
        file_root=args.file_root or "", dataset=args.dataset, word_map=args.word_map,
        embed_dim=args.embed_dim, n_head=args.n_head, n_layer=args.n_layer,
        beam_size=args.beam_size,
    )
    return ccfg, load_word_map(ccfg)


def run_export(args):
    platforms = tuple(args.platforms.split(","))
    if args.model_task == "cc":
        from change3d_tpu.export import export_caption_model
        from change3d_tpu.inference import restore_best_variables
        from change3d_tpu.train.caption_loop import build_caption_model

        if args.in_width != args.in_height:
            raise SystemExit(
                "cc export: the caption model is square-input "
                "(--in_height must equal --in_width)"
            )
        ccfg, word_map = _cc_config_and_word_map(args)
        model = build_caption_model(ccfg, len(word_map), in_size=args.in_height)
        blob = export_caption_model(
            model, restore_best_variables(model, args.checkpoint), word_map,
            args.out, beam_size=args.beam_size, platforms=platforms, batch=args.batch,
        )
    else:
        from change3d_tpu.export import export_from_checkpoint, export_model
        from change3d_tpu.train.loop import build_model, RunConfig

        cfg = RunConfig(
            task=args.model_task, num_classes=args.num_class,
            in_height=args.in_height, in_width=args.in_width,
            quantized=args.quantized, quant_mode=args.quant_mode,
        )
        model = build_model(cfg)
        if args.quantized and args.quant_mode == "static":
            # Calibrate on train-split batches, bake the frozen scales into
            # the artifact: the served program has no runtime reductions.
            from change3d_tpu.data.datasets import BCDDataset, SCDDataset, BDADataset
            from change3d_tpu.data.pipeline import make_data_loader, pair_collate
            from change3d_tpu.data.transforms import make_transform_pipelines
            from change3d_tpu.inference import (
                calibrate_quant_scales,
                restore_best_variables,
            )

            if not args.file_root:
                raise SystemExit("static export needs --file_root for calibration")
            _, eval_tf = make_transform_pipelines(
                args.model_task, args.in_width, args.in_height
            )
            ds_cls = {"bcd": BCDDataset, "scd": SCDDataset, "bda": BDADataset}
            calib_data = ds_cls[args.model_task](args.file_root, "train", eval_tf)
            loader = make_data_loader(
                "threaded", calib_data, args.calib_batch_size, shuffle=False,
                num_workers=2, collate=pair_collate, drop_last=True,
            )
            batches = []
            for i, b in enumerate(loader):
                if i >= args.calib_batches:
                    break
                batches.append((b["pre"], b["post"]))
            variables = restore_best_variables(model, args.checkpoint)
            scales = calibrate_quant_scales(model, variables, batches)
            print(f"static int8: calibrated on {len(batches)} train batches")
            blob = export_model(
                model, {**variables, "quant": scales}, args.out,
                platforms=platforms, batch=args.batch,
            )
        else:
            blob = export_from_checkpoint(
                model, args.checkpoint, args.out, platforms=platforms, batch=args.batch,
            )
    print(f"exported {len(blob)} bytes to {args.out}")


def run_serve(args):
    """Start the HTTP batching prediction service (change3d_tpu/serving.py)."""
    from change3d_tpu.serving import PredictService, serve_forever

    if args.shard and args.artifact:
        raise SystemExit(
            "--shard applies to checkpoint-backed serving (artifacts bake "
            "their own single-device program; export per device instead)"
        )

    if args.model_task == "cc":
        ccfg, word_map = _cc_config_and_word_map(args)
        if args.artifact:
            from change3d_tpu.inference import CaptionArtifactPredictor

            predictor = CaptionArtifactPredictor(args.artifact, word_map)
        else:
            from change3d_tpu.inference import CaptionPredictor, restore_best_variables
            from change3d_tpu.train.caption_loop import build_caption_model

            backbone = None
            if args.packed or args.fused or args.quantized:
                import dataclasses as _dc

                from change3d_tpu.models.x3d import x3d_l_config

                backbone = _dc.replace(
                    x3d_l_config(),
                    packed_eval_stages=(0,) if args.packed else (),
                    fused_inference=args.fused,
                    quantized_eval=args.quantized,
                )
            model = build_caption_model(
                ccfg, len(word_map), in_size=args.in_height, backbone_cfg=backbone
            )
            predictor = CaptionPredictor(
                model, restore_best_variables(model, args.checkpoint), word_map,
                beam_size=args.beam_size, embed_weights=True, shard=args.shard,
            )
    elif args.artifact:
        from change3d_tpu.inference import ArtifactPredictor

        predictor = ArtifactPredictor(args.artifact)
    else:
        from change3d_tpu.inference import Predictor
        from change3d_tpu.train.loop import build_model, RunConfig

        cfg = RunConfig(
            task=args.model_task, num_classes=args.num_class,
            in_height=args.in_height, in_width=args.in_width,
            packed=args.packed, fused=args.fused, quantized=args.quantized,
        )
        predictor = Predictor.from_checkpoint(
            build_model(cfg), args.checkpoint, embed_weights=True,
            shard=args.shard,
        )
    service = PredictService(
        args.model_task, predictor,
        batch_size=args.batch_size, max_delay_ms=args.max_delay_ms,
        tiled=args.tiled, tile_overlap=args.tile_overlap,
        warmup=not args.no_warmup,
        buckets=(tuple(int(b) for b in args.buckets.split(","))
                 if args.buckets else None),
    )
    serve_forever(service, args.host, args.port)


def run_predict_captions(args):
    """Decode captions for every image pair in a caption split and write
    ``captions.json`` (one entry per image: {"image_id", "caption"})."""
    import json

    import numpy as np

    from change3d_tpu.data.datasets import CaptionDataset
    from change3d_tpu.data.pipeline import DataLoader, caption_collate
    from change3d_tpu.inference import CaptionPredictor
    from change3d_tpu.train.caption_loop import (
        CaptionRunConfig,
        _EveryFifth,
        build_caption_model,
        load_word_map,
    )

    cfg = CaptionRunConfig(
        file_root=args.file_root, dataset=args.dataset, word_map=args.word_map,
        embed_dim=args.embed_dim, n_head=args.n_head, n_layer=args.n_layer,
    )
    word_map = load_word_map(cfg)
    ds = _EveryFifth(CaptionDataset(args.file_root, args.dataset, args.split.upper()))
    sample = ds.__getitem__(0)
    backbone = None
    if args.quantized:
        import dataclasses as _dc

        from change3d_tpu.models.x3d import x3d_l_config

        if args.quant_mode == "static":
            raise SystemExit("cc predict supports dynamic int8 only")
        backbone = _dc.replace(x3d_l_config(), quantized_eval=True)
    model = build_caption_model(
        cfg, len(word_map), in_size=sample["pre"].shape[0], backbone_cfg=backbone
    )
    predictor = CaptionPredictor.from_checkpoint(
        model, args.checkpoint, word_map=word_map, beam_size=args.beam_size
    )
    loader = DataLoader(ds, args.batch_size, num_workers=2, collate=caption_collate, pad_final=True)
    captions, idx = [], 0
    for batch in loader:
        valid = batch.pop("valid", np.ones(len(batch["pre"]), bool))
        texts = predictor.caption(batch["pre"], batch["post"])
        for i, text in enumerate(texts):
            if valid[i]:
                captions.append({"image_id": idx, "caption": text})
                idx += 1
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "captions.json"), "w") as f:
        json.dump(captions, f, indent=1)
    print(f"wrote {idx} captions to {os.path.join(args.out, 'captions.json')}")


def run_predict(args):
    """Write per-image prediction masks (PNG) for every pair in a split.

    ``--tiled`` switches to full-scene mode: images are consumed at native
    resolution, slid under the model's (in_height, in_width) window with
    ``--tile_overlap``, and the soft maps are cosine-blended before
    thresholding — scenes of any size, one compiled forward."""
    import cv2
    import numpy as np

    from change3d_tpu.data.datasets import BCDDataset, SCDDataset, BDADataset
    from change3d_tpu.data.pipeline import DataLoader, pair_collate
    from change3d_tpu.data.transforms import make_transform_pipelines
    from change3d_tpu.inference import (
        Predictor,
        TiledPredictor,
        restore_best_variables,
    )
    from change3d_tpu.train.loop import build_model, calibrate_from_train_split, RunConfig

    cfg = RunConfig(
        task=args.model_task, num_classes=args.num_class,
        in_height=args.in_height, in_width=args.in_width,
        quantized=args.quantized, quant_mode=args.quant_mode,
        calib_batches=args.calib_batches, file_root=args.file_root,
        batch_size=args.batch_size,
    )
    model = build_model(cfg)
    variables = restore_best_variables(model, args.checkpoint)
    if args.quantized and args.quant_mode == "static":
        variables = {
            **variables,
            "quant": calibrate_from_train_split(cfg, model, variables),
        }
    predictor = Predictor(model, variables, shard=args.shard)
    ds_cls = {"bcd": BCDDataset, "scd": SCDDataset, "bda": BDADataset}[args.model_task]
    os.makedirs(args.out, exist_ok=True)

    def write_one(name: str, out) -> None:
        """out: hardened per-image maps [H, W] / [H, W] int."""
        if args.model_task == "bcd":
            cv2.imwrite(os.path.join(args.out, f"{name}.png"), out["change"].astype(np.uint8) * 255)
        elif args.model_task == "scd":
            change = out["change"]
            cv2.imwrite(os.path.join(args.out, f"{name}_pre.png"), (out["pre"] * change).astype(np.uint8))
            cv2.imwrite(os.path.join(args.out, f"{name}_post.png"), (out["post"] * change).astype(np.uint8))
            cv2.imwrite(os.path.join(args.out, f"{name}_change.png"), change.astype(np.uint8) * 255)
        else:
            cv2.imwrite(os.path.join(args.out, f"{name}_loc.png"), out["loc"].astype(np.uint8) * 255)
            cv2.imwrite(os.path.join(args.out, f"{name}_cls.png"), out["cls"].astype(np.uint8))

    if args.tiled:
        ds = ds_cls(args.file_root, args.split, None)  # native scene sizes
        names = [os.path.basename(p) for p in ds.pre_images]
        tiled = TiledPredictor(
            predictor, overlap=args.tile_overlap, batch_size=args.batch_size
        )
        from change3d_tpu.data.transforms import eval_normalize

        for idx, name in enumerate(names):
            img, _ = ds[idx]
            # The eval transform's normalization without its resize — tiling
            # replaces it.
            img = eval_normalize(img)
            out = tiled.predict_scene(img[..., :3], img[..., 3:])
            write_one(os.path.splitext(name)[0], out)
        print(f"wrote {len(names)} scene predictions to {args.out}")
        return

    _, eval_tf = make_transform_pipelines(args.model_task, args.in_width, args.in_height)
    ds = ds_cls(args.file_root, args.split, eval_tf)
    names = [os.path.basename(p) for p in ds.pre_images]
    loader = DataLoader(ds, args.batch_size, num_workers=2, collate=pair_collate, pad_final=True)
    idx = 0
    for batch in loader:
        valid = batch.pop("valid")
        out = predictor.predict(batch["pre"], batch["post"])
        for i in range(len(valid)):
            if not valid[i]:
                continue
            write_one(
                os.path.splitext(names[idx])[0],
                {k: v[i] for k, v in out.items()},
            )
            idx += 1
    print(f"wrote {idx} predictions to {args.out}")


def main(argv=None):
    from change3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if getattr(args, "platform", None):
        # Must land before the first backend lookup; the TPU plugin re-asserts
        # JAX_PLATFORMS, so the config override (not the env var) is the
        # reliable switch.
        import jax

        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "coordinator_address", None) or getattr(args, "num_processes", None):
        from change3d_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    if args.task in ("bcd", "scd", "bda"):
        cfg = RunConfig(
            task=args.task,
            dataset=args.dataset,
            file_root=args.file_root,
            save_dir=args.save_dir,
            in_height=args.in_height,
            in_width=args.in_width,
            num_classes=args.num_class,
            max_steps=args.max_steps,
            max_epochs=args.max_epochs,
            batch_size=args.batch_size,
            lr=args.lr,
            lr_mode=args.lr_mode,
            step_loss=args.step_loss,
            pretrained=args.pretrained,
            resume=args.resume,
            num_workers=args.num_workers,
            seed=args.seed,
            compute_dtype=args.compute_dtype,
            remat=args.remat,
            packed=args.packed,
            fused=args.fused,
            loader=args.loader,
            profile_dir=args.profile_dir,
        )
        return run_detection_training(cfg)
    elif args.task == "cc":
        from change3d_tpu.train.caption_loop import run_caption_training

        return run_caption_training(args)
    elif args.task == "predict":
        if args.model_task == "cc":
            return run_predict_captions(args)
        return run_predict(args)
    elif args.task == "export":
        return run_export(args)
    elif args.task == "serve":
        return run_serve(args)
    elif args.task == "info":
        return run_info(args)
    elif args.task == "eval":
        return run_eval(args)
    elif args.task == "convert-reference":
        return run_convert_reference(args)
    elif args.task == "verify-checkpoint":
        return run_verify_checkpoint(args)


def entrypoint() -> int:
    """Console-script entry (pyproject [project.scripts] `change3d`).

    Train subcommands return result dicts (ignored); verify-checkpoint
    returns an int status that must become the process exit code so
    `verify-checkpoint --trace ... && deploy` style gates actually gate."""
    r = main()
    return r if isinstance(r, int) else 0


if __name__ == "__main__":
    import sys as _sys

    _sys.exit(entrypoint())
