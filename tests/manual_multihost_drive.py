"""Full multi-host training drive: two real processes, one `cli.py bcd` run.

Launches two subprocesses that both run the PRODUCTION entry point
(`python -m change3d_tpu.cli bcd --coordinator_address ... --num_processes 2
--process_id {0,1}`) against the same synthetic dataset over a 2-process x
2-virtual-CPU-device gloo mesh — end to end: process-sharded loaders, global
batch assembly, GSPMD cross-host gradient/batch-stat reductions, per-epoch
eval with the padded-final-batch mask, orbax checkpointing (all processes
participate), and the best-model re-eval.

Run:  python tests/manual_multihost_drive.py [-- extra cli flags...]
e.g.  python tests/manual_multihost_drive.py -- --loader grain
Pass criteria: both ranks exit 0 and report the same final F1.
"""

import json
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from change3d_tpu.cli import main

rank = int(sys.argv[1])
results = main([
    "bcd", "--dataset", "SYNTH-MH", "--file_root", {root!r},
    "--in_height", "32", "--in_width", "32", "--batch_size", "8",
    "--max_epochs", "2", "--max_steps", "4",
    "--save_dir", {save!r},
    "--num_workers", "1", "--no-remat",
    "--coordinator_address", {addr!r},
    "--num_processes", "2", "--process_id", str(rank),
] + {extra!r})
final = results.get("test_best") or results.get("last") or {{}}
print(f"RANK{{rank}} F1={{float(final.get('F1', -1)):.6f}}", flush=True)
"""


def main() -> int:
    from tests._tiny_bcd import write_dataset

    root = "/tmp/synth_mh_drive"
    save = "/tmp/exp_mh_drive"
    if not os.path.exists(os.path.join(root, "train", "label")):
        write_dataset(root, n=16, hw=32)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    extra = sys.argv[1:]
    if extra and extra[0] == "--":
        extra = extra[1:]
    code = _WORKER.format(repo=REPO, root=root, save=save, addr=addr, extra=extra)
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    f1s = []
    ok = True
    for rank, (p, out) in enumerate(zip(procs, outs)):
        m = re.search(rf"RANK{rank} F1=([-\d.]+)", out)
        if p.returncode != 0 or not m:
            print(f"rank {rank} FAILED (rc={p.returncode}):\n{out[-3000:]}")
            ok = False
            continue
        f1s.append(float(m.group(1)))
        print(f"rank {rank}: F1={m.group(1)}")
    if ok and len(f1s) == 2 and abs(f1s[0] - f1s[1]) < 1e-9:
        print(json.dumps({"multihost_drive": "PASS", "F1": f1s[0]}))
        return 0
    print(json.dumps({"multihost_drive": "FAIL", "f1s": f1s}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
