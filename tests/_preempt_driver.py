"""Subprocess driver for the preemption drill (tests/test_preemption.py).

Runs a tiny-backbone BCD training through the REAL host loop
(change3d_tpu.train.loop.run_detection_training) so a parent test process
can deliver an actual SIGTERM and observe the checkpoint-and-clean-exit
behavior, then resume. The backbone is shrunk (not the loop) — everything
preemption-relevant (PreemptionGuard, orbax saves, sidecar, mid-epoch skip)
is production code.

Usage: python tests/_preempt_driver.py ROOT SAVE_DIR MODE MAX_EPOCHS
  MODE: 'train' | 'resume'
Prints 'DRIVER_RESULT {json}' on completion.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def install_tiny_backbone():
    """Route loop.build_model through the shared tiny X3D config."""
    import change3d_tpu.train.loop as L
    from change3d_tpu.models.trainer import Change3D, Task
    from change3d_tpu.models.x3d import X3DConfig

    from tests._tiny_bcd import TINY_KW

    tiny = X3DConfig(**TINY_KW, remat=False)

    def tiny_build(cfg):
        return Change3D(
            task=Task(cfg.task),
            num_classes=cfg.num_classes,
            in_height=cfg.in_height,
            in_width=cfg.in_width,
            backbone_cfg=tiny,
        )

    L.build_model = tiny_build
    return L


def make_cfg(L, root: str, save_dir: str, mode: str, max_epochs: int):
    return L.RunConfig(
        task="bcd",
        dataset="drill",
        file_root=root,
        save_dir=save_dir,
        in_height=16,
        in_width=16,
        batch_size=8,
        max_epochs=max_epochs,
        num_workers=1,
        remat=False,
        resume=(mode == "resume"),
    )


def main() -> int:
    root, save_dir, mode, max_epochs = sys.argv[1:5]
    L = install_tiny_backbone()
    cfg = make_cfg(L, root, save_dir, mode, int(max_epochs))
    results = L.run_detection_training(cfg)
    print(
        "DRIVER_RESULT "
        + json.dumps({"preempted_at_step": results.get("preempted_at_step")}),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
