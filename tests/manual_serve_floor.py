"""Deployment-path regression guard: served HTTP throughput + CC beam-decode
throughput vs the floors committed in BENCH_SERVE.json.

Run on TPU:  python tests/manual_serve_floor.py

Served floors are deliberately set at ~half the round-4 measured rates: on
this environment the relay wire (~5-6 MB/s effective request uplink), not the
serving stack, sets the level, so the guard exists to catch stack breakage
(codec, batcher, wire protocol, artifact path) and gross regressions — not
link jitter. Decode floors are device-side and sit ~15% under the pinned
numbers. Update floors together with BENCH_SERVE.json whenever a deliberate
change re-pins the matrix.
"""

import json
import re
import subprocess
import sys

# Served floors carry extra margin beyond wire jitter: on this 1-core host
# any concurrent CPU work halves client-side throughput (observed 15.55
# unloaded vs 8.22 with a test suite running alongside).
# Decode floors guard the CHAINED device-side rates (one host round trip per
# 20 decodes): after the round-5 beam-1 fast path the decode compute
# (~18 ms/batch-32) is LESS than one relay round trip (~35-50 ms, varies by
# the hour), so per-call rates measure the relay, not the kernel — the
# round-4 per-call floors (740/520) produced a false FAIL on a slow-RTT day
# while the device-side rate had actually improved. Round-5 chained pins:
# k=1 1811 img/s, k=5 1493 (fp32 memory, batch 32, 51 worst-case steps);
# floors ~4% under.
FLOORS = {
    "served_raw_b128_pairs_per_sec": 5.0,
    "served_artifact_b32_pairs_per_sec": 4.0,
    "decode_k1_chained_img_per_sec": 1738.0,
    "decode_k5_chained_img_per_sec": 1433.0,
}


def _last_json(out: subprocess.CompletedProcess) -> dict | None:
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else None


def main() -> int:
    failures = 0

    def check(name: str, value: float | None) -> None:
        nonlocal failures
        floor = FLOORS[name]
        ok = value is not None and value >= floor
        shown = "no output" if value is None else f"{value}"
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {shown} (floor {floor})")
        failures += 0 if ok else 1

    serve = [sys.executable, "tests/manual_serve_bench.py", "--wire", "raw",
             "--batch", "128", "--requests", "256"]
    rec = _last_json(subprocess.run(serve, capture_output=True, text=True,
                                    cwd="/root/repo", timeout=900))
    check("served_raw_b128_pairs_per_sec",
          rec.get("served_pairs_per_sec") if rec else None)

    art = [sys.executable, "tests/manual_serve_bench.py", "--artifact",
           "--batch", "32", "--requests", "128"]
    rec = _last_json(subprocess.run(art, capture_output=True, text=True,
                                    cwd="/root/repo", timeout=900))
    check("served_artifact_b32_pairs_per_sec",
          rec.get("served_pairs_per_sec") if rec else None)

    dec = subprocess.run([sys.executable, "tests/manual_decode_bench.py"],
                         capture_output=True, text=True, cwd="/root/repo",
                         timeout=900)
    rates: dict[str, float] = {}
    for line in dec.stdout.splitlines():
        m = re.match(r"k=(\d+)\s+(\w+)\s+[\d.]+ ms/batch-\d+ decode "
                     r"\(([\d.]+) img/s\)", line.strip())
        if m:
            rates[f"k{m.group(1)}_{m.group(2)}"] = float(m.group(3))
    check("decode_k1_chained_img_per_sec", rates.get("k1_chained"))
    check("decode_k5_chained_img_per_sec", rates.get("k5_chained"))

    return failures


if __name__ == "__main__":
    sys.exit(main())
