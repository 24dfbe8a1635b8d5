"""Full multi-host CC training drive: two real processes, one `cli.py cc` run.

The captioning analog of manual_multihost_drive.py: both ranks run the
PRODUCTION entry point (`python -m change3d_tpu.cli cc --coordinator_address
... --num_processes 2 --process_id {0,1}`) against the same synthetic HDF5
caption dataset over a 2-process x 2-virtual-CPU-device gloo mesh — end to
end: process-sharded loaders, global batch assembly, teacher-forced training,
per-epoch beam-search eval with the per-host slice decode +
_allgather_caption_results reconstruction, the shared BLEU-4 best gate, and
collective orbax checkpointing.

Run:  python tests/manual_multihost_cc_drive.py
Pass criteria: both ranks exit 0 and report the same final BLEU-4.
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
    "cc", "--dataset", "DS", "--file_root", {root!r},
    "--in_height", "32", "--in_width", "32", "--batch_size", "8",
    "--epochs", "2", "--beam_size", "1", "--eval_batch_size", "4",
    "--save_dir", {save!r}, "--num_workers", "1",
    "--coordinator_address", {addr!r},
    "--num_processes", "2", "--process_id", str(rank),
])
print(f"RANK{{rank}} BLEU4={{float(results.get('Bleu_4', -1)):.8f}}", flush=True)
"""


def main() -> int:
    from tests._tiny_cc import write_caption_dataset

    root = "/tmp/synth_mh_cc_drive"
    save = "/tmp/exp_mh_cc_drive"
    if not os.path.exists(os.path.join(root, "WORDMAP_DS.json")):
        write_caption_dataset(root, n_imgs=8, cpi=5, cap_len=12, hw=32)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    code = _WORKER.format(repo=REPO, root=root, save=save, addr=addr)
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    b4s = []
    ok = True
    for rank, (p, out) in enumerate(zip(procs, outs)):
        m = re.search(rf"RANK{rank} BLEU4=([-\d.]+)", out)
        if p.returncode != 0 or not m:
            print(f"rank {rank} FAILED (rc={p.returncode}):\n{out[-3000:]}")
            ok = False
            continue
        b4s.append(float(m.group(1)))
        print(f"rank {rank}: BLEU4={m.group(1)}")
    if ok and len(b4s) == 2 and abs(b4s[0] - b4s[1]) < 1e-9:
        print(json.dumps({"multihost_cc_drive": "PASS", "Bleu_4": b4s[0]}))
        return 0
    print(json.dumps({"multihost_cc_drive": "FAIL", "bleu4s": b4s}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
