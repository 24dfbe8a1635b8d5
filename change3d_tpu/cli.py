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


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("change3d_tpu")
    sub = parser.add_subparsers(dest="task", required=True)

    bcd = sub.add_parser("bcd", help="binary change detection")
    _common_flags(bcd)
    bcd.add_argument("--dataset", default="LEVIR-CD")
    bcd.add_argument("--num_class", type=int, default=1)
    bcd.add_argument("--max_steps", type=int, default=80_000)

    scd = sub.add_parser("scd", help="semantic change detection")
    _common_flags(scd)
    scd.add_argument("--dataset", default="SECOND")
    scd.add_argument("--num_class", type=int, default=6)
    scd.add_argument("--max_steps", type=int, default=80_000)
    scd.set_defaults(batch_size=8)

    bda = sub.add_parser("bda", help="building damage assessment")
    _common_flags(bda)
    bda.add_argument("--dataset", default="xBD")
    bda.add_argument("--num_class", type=int, default=5)
    bda.add_argument("--max_steps", type=int, default=200_000)
    bda.set_defaults(batch_size=12)

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
    cc.set_defaults(batch_size=32, lr=1e-4)
    return parser


def main(argv=None):
    from change3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
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
        )
        return run_detection_training(cfg)
    elif args.task == "cc":
        from change3d_tpu.train.caption_loop import run_caption_training

        return run_caption_training(args)


if __name__ == "__main__":
    main()
