"""Bench regression guard: run the production eval + train benches and fail
loudly if throughput drops below the committed floors.

Run on TPU:  python tests/manual_bench_floor.py

Floors are set ~4%% under the pinned round-3 measurements so relay jitter
(observed +-0.3 pairs/s across four same-config runs) never trips them but a
real regression (like an accidental config/dtype change) does. Update the
floors whenever a deliberate perf change re-pins the production numbers —
with the measurement, in the same commit.
"""

import json
import subprocess
import sys

# (command, metric, floor, pinned value)
CHECKS = [
    # Round-4 production config: b128 packed + embedded weights (bench.py
    # default since round 4; ladder + decision in BENCH_EVAL.json).
    ([sys.executable, "bench.py"], "bcd_eval_pairs_per_sec_256", 673.0, 701.7),
    ([sys.executable, "bench_train.py"], "bcd_train_samples_per_sec_256", 90.0, None),
    # Per-task eval throughput (BENCH_TASKS.json, round-5 re-pins): production
    # inference config per task, CC runs the full beam-decode pipeline.
    # SCD's floor sits above 5x baseline (277.8) by design — a regression
    # below the 5x north star must fail loudly, not shave silently.
    ([sys.executable, "bench_tasks.py", "scd"], "scd_eval_samples_per_sec_256", 294.0, 306.6),
    ([sys.executable, "bench_tasks.py", "bda"], "bda_eval_samples_per_sec_256", 418.0, 436.2),
    ([sys.executable, "bench_tasks.py", "cc"], "cc_eval_samples_per_sec_256", 572.0, 595.8),
]


def main() -> int:
    failures = 0
    for cmd, metric, floor, pinned in CHECKS:
        out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
        recs = [
            json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")
        ]
        # A bench may print several rows (e.g. cc worst-case + realistic);
        # guard the one whose metric name matches.
        recs = [r for r in recs if r.get("metric") == metric]
        if not recs:
            print(f"FAIL {metric}: no JSON output\n{out.stdout[-500:]}{out.stderr[-500:]}")
            failures += 1
            continue
        rec = recs[-1]
        ok = rec["value"] >= floor
        print(
            f"{'ok  ' if ok else 'FAIL'} {metric}: {rec['value']} "
            f"(floor {floor}" + (f", pinned {pinned}" if pinned else "") + ")"
        )
        failures += 0 if ok else 1
    return failures


if __name__ == "__main__":
    sys.exit(main())
