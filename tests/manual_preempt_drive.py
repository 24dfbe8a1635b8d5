"""Preemption drill through the REAL CLI on the real device (round 5).

The CPU-mesh suite (tests/test_preemption.py) proves SIGTERM ->
finish-step -> durable mid-epoch save -> clean exit -> bit-exact resume with
a tiny backbone. This drive runs the same path at full X3D-L through
``python -m change3d_tpu.cli bcd`` on the attached TPU: train a few epochs
on a synthetic LEVIR-format dataset, deliver a real SIGTERM from outside,
assert the preempt save + exit 0, then ``--resume`` to completion.

Usage:  python tests/manual_preempt_drive.py [--root /tmp/synth_levir_preempt]
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def launch(argv):
    return subprocess.Popen(
        [sys.executable, "-m", "change3d_tpu.cli"] + argv,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def pump_until(proc, needle: str, timeout: float, sink: list) -> bool:
    """Read lines until one contains ``needle`` (True) or EOF/timeout."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        line = proc.stdout.readline()
        if not line:
            return False
        sink.append(line)
        print("  |", line.rstrip(), flush=True)
        if needle in line:
            return True
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_levir_preempt")
    ap.add_argument("--save_dir", default="/tmp/exp_preempt_drive")
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()

    from tests.manual_overfit_bcd import make_dataset

    if not os.path.exists(os.path.join(args.root, "train")):
        make_dataset(args.root, n_train=64, n_test=16, size=args.size)
        print(f"built synthetic dataset at {args.root}")

    cli = [
        "bcd", "--dataset", "DRILL", "--file_root", args.root,
        "--in_height", str(args.size), "--in_width", str(args.size),
        "--batch_size", "4", "--max_epochs", "8", "--max_steps", "128",
        "--save_dir", args.save_dir, "--num_workers", "1",
    ]

    # Phase 1: train, SIGTERM after epoch 2's train pass is underway.
    out: list = []
    p = launch(cli)
    ok = pump_until(p, "[epoch 2] train loss", 1800, out)
    assert ok, "training never reached epoch 2 (compile stall?)"
    time.sleep(0.5)  # land inside epoch-2 eval / epoch-3 steps
    p.send_signal(signal.SIGTERM)
    print("  >> SIGTERM sent", flush=True)
    saved = pump_until(p, "[preempt] checkpoint saved at step", 600, out)
    p.wait(timeout=120)
    assert saved, "no preempt-save line after SIGTERM"
    assert p.returncode == 0, f"preempted run exited {p.returncode}, want 0"
    print(f"PHASE 1 OK: clean preempt exit (rc 0)")

    # Phase 2: resume to completion.
    out2: list = []
    p = launch(cli + ["--resume"])
    done = pump_until(p, "test_best", 1800, out2) or pump_until(p, "[epoch 7]", 5, out2)
    # drain remaining output
    rest = p.stdout.read()
    if rest:
        out2.append(rest)
        print("  |", rest.strip()[-400:], flush=True)
    p.wait(timeout=300)
    text2 = "".join(out2)
    assert p.returncode == 0, f"resume run exited {p.returncode}, want 0"
    assert "[epoch 7]" in text2 or "test_best" in text2, "resume did not finish all epochs"
    resumed_mid = "[resume] epoch" in text2
    print(f"PHASE 2 OK: resumed ({'mid-epoch skip' if resumed_mid else 'epoch boundary'}), "
          f"ran to completion (rc 0)")
    print("PREEMPT DRIVE PASS")


if __name__ == "__main__":
    main()
