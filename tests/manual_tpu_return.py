#!/usr/bin/env python
"""One command for the ROADMAP "when the TPU link returns" checklist.

    python tests/manual_tpu_return.py [--skip-serve]

Runs, in order, each as a subprocess against the real chip:
  1. bench.py                      (production eval config — floor 645)
  2. bench_train.py                (production train config — floor 90)
  3. bench.py 128 0 int8           (dynamic-int8 A/B vs #1)
  4. bench.py 128 0 int8 embed     (int8 + constant-folded weights)
  5. tests/manual_serve_bench.py   (HTTP served pairs/s, unless --skip-serve)

Prints a JSON summary and exits nonzero if a floor fails or any step
errors. Record the numbers in ARCHITECTURE.md and, if int8 wins, consider
flipping the bench production flags.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = [
    ("eval_fp32", [sys.executable, "bench.py"], 645.0),
    ("train", [sys.executable, "bench_train.py"], 90.0),
    ("eval_int8", [sys.executable, "bench.py", "128", "0", "int8"], None),
    ("eval_int8_static", [sys.executable, "bench.py", "128", "0", "int8s"], None),
    ("eval_int8_embed", [sys.executable, "bench.py", "128", "0", "int8", "embed"], None),
    ("served", [sys.executable, "tests/manual_serve_bench.py",
                "--batch", "128", "--requests", "512"], None),
]


def run(cmd, timeout=3600):
    try:
        r = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return {"error": f"step exceeded {timeout}s (relay stall?)"}
    line = (r.stdout.strip().splitlines() or [""])[-1]
    try:
        rec = json.loads(line)
    except json.JSONDecodeError:
        return {"error": f"rc={r.returncode}, no JSON tail: {line[-200:]!r}"}
    if r.returncode != 0 and "error" not in rec:
        rec["error"] = f"rc={r.returncode}: {r.stderr.strip()[-200:]}"
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-serve", action="store_true")
    args = ap.parse_args()

    results, failed = {}, []
    for name, cmd, floor in STEPS:
        if args.skip_serve and name == "served":
            continue
        rec = run(cmd)
        results[name] = rec
        value = rec.get("value") or rec.get("served_pairs_per_sec") or 0
        if "error" in rec:
            failed.append(f"{name}: {rec['error']}")
        elif floor is not None and value < floor:
            failed.append(f"{name}: {value} under floor {floor}")
        print(f"[{name}] {json.dumps(rec)}", flush=True)

    fp32 = results.get("eval_fp32", {}).get("value") or 0
    int8 = results.get("eval_int8", {}).get("value") or 0
    summary = {
        "ok": not failed,
        "failures": failed,
        "int8_speedup_vs_fp32": round(int8 / fp32, 3) if fp32 and int8 else None,
    }
    print(json.dumps(summary))
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
