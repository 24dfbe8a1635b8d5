#!/usr/bin/env python
"""Full-scale checkpoint-parity drill: the complete verify-checkpoint flow at
real X3D-L dimensions, on a synthetic `.pyth`, so the day the real Kinetics
asset appears the only untested variable is the weights themselves.

    python tests/manual_verify_drill.py [--height 256 --width 256] [--platform cpu]

Steps (all through the production tools, no shortcuts):
  1. full-size X3D-L state_dict (tests/torch_oracle.make_random_x3d_state_dict
     with the default x3d_l_config — 6,153,384 backbone params), torch-saved
     as {'model_state': sd} exactly like the reference's X3D_L.pyth
     (ref: /root/reference/model/trainer.py:44-45);
  2. tools/record_torch_trace.py records the oracle per-block activations at
     the requested probe dims;
  3. `cli verify-checkpoint --trace` strict-converts the .pyth and compares
     the JAX per-block forward against the trace on the selected platform;
  4. a tamper re-run (one weight perturbed) must FAIL.

Writes the pass report to VERIFY_DRILL.json (repo root) with the dims,
platform, per-block max errors, and the tamper outcome.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--platform", default=None, help="e.g. cpu (default: attached TPU)")
    ap.add_argument("--out", default=os.path.join(REPO, "VERIFY_DRILL.json"))
    args = ap.parse_args()

    import numpy as np
    import torch

    from tests.torch_oracle import make_random_x3d_state_dict

    work = "/tmp/verify_drill"
    os.makedirs(work, exist_ok=True)
    pyth = os.path.join(work, "X3D_L_synth.pyth")
    trace = os.path.join(work, "ref_acts.npz")
    report_path = os.path.join(work, "report.json")

    sd = make_random_x3d_state_dict(seed=4, fan_scaled=True)
    n_params = sum(int(np.prod(v.shape)) for k, v in sd.items() if v.dim() > 0)
    torch.save({"model_state": sd}, pyth)
    print(f"[drill] wrote {pyth} ({n_params:,} scalar params)")

    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "record_torch_trace.py"),
         pyth, trace, "--height", str(args.height), "--width", str(args.width),
         "--frames", str(args.frames)],
        cwd=REPO, capture_output=True, text=True,
    )
    if r.returncode != 0:
        print(f"[drill] trace FAILED:\n{r.stderr[-2000:]}")
        return 1
    torch_s = time.time() - t0
    print(f"[drill] torch trace recorded in {torch_s:.1f}s")

    def run_verify(ckpt):
        cmd = [sys.executable, "-m", "change3d_tpu.cli", "verify-checkpoint",
               "--pretrained", ckpt, "--trace", trace,
               "--height", str(args.height), "--width", str(args.width),
               "--frames", str(args.frames), "--report", report_path]
        env = dict(os.environ)
        if args.platform:
            env["JAX_PLATFORMS"] = args.platform
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, env=env)
        return r, time.time() - t0

    r, verify_s = run_verify(pyth)
    print(r.stdout[-3000:])
    if r.returncode != 0:
        print(f"[drill] verify-checkpoint FAILED (rc={r.returncode}):\n{r.stderr[-2000:]}")
        return 1
    with open(report_path) as f:
        report = json.load(f)

    # Tamper: one mid-network depthwise weight perturbed -> must FAIL.
    sd_bad = {k: v.clone() if torch.is_tensor(v) else v for k, v in sd.items()}
    key = "blocks.2.res_blocks.3.branch2.conv_b.weight"
    sd_bad[key] = sd_bad[key] + 0.05
    pyth_bad = os.path.join(work, "X3D_L_tampered.pyth")
    torch.save({"model_state": sd_bad}, pyth_bad)
    rb, _ = run_verify(pyth_bad)
    tamper_failed = rb.returncode != 0
    print(f"[drill] tampered checkpoint verify rc={rb.returncode} "
          f"({'FAILS as required' if tamper_failed else 'UNEXPECTEDLY PASSED'})")

    ok = bool(report.get("all_pass")) and tamper_failed
    out = {
        "drill": "full-scale synthetic X3D_L.pyth verify-checkpoint",
        "date": time.strftime("%Y-%m-%d"),
        "probe": {"frames": args.frames, "height": args.height, "width": args.width},
        "platform": args.platform or "attached (axon TPU)",
        "scalar_params": n_params,
        "torch_trace_s": round(torch_s, 1),
        "verify_s": round(verify_s, 1),
        "report": report,
        "tamper_detected": tamper_failed,
        "ok": ok,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"verify_drill": "PASS" if ok else "FAIL", "out": args.out}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
