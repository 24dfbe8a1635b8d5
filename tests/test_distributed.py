"""Real multi-process jax.distributed smoke test on CPU.

Launches two fresh processes that both call parallel.distributed.initialize
against a local coordinator, build the global data mesh (2 hosts x 2 local
CPU devices = 4 global devices), jit-reduce a mesh-sharded global array to a
replicated scalar (GSPMD cross-host all-reduce), and process_allgather a
host value — validating the multi-host init and mesh-collective paths
end-to-end, not just their argument plumbing.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
sys.path.insert(0, "@REPO@")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from change3d_tpu.parallel.distributed import initialize, is_primary

initialize(
    coordinator_address="@ADDR@",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from change3d_tpu.parallel.mesh import make_mesh, batch_sharding

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
mesh = make_mesh()
assert len(mesh.devices.flat) == 4

# A real collective through the mesh: build a global array sharded over the
# 'data' axis (each process contributes its 2 local shards) and jit-reduce it
# to a replicated scalar — GSPMD emits the cross-host all-reduce.
local = np.full((2,), float(jax.process_index() + 1), np.float32)
garr = jax.make_array_from_process_local_data(batch_sharding(mesh), local, (4,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == 6.0, total  # 1 + 1 + 2 + 2

# And host-level aggregation for metrics-style code.
from jax.experimental import multihost_utils
ag = multihost_utils.process_allgather(jnp.asarray([float(jax.process_index() + 1)]))
assert float(ag.sum()) == 3.0, ag
print(f"proc {jax.process_index()} primary={is_primary()} ok", flush=True)
"""


_TRAIN_WORKER = r"""
import os, sys
sys.path.insert(0, "@REPO@")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from change3d_tpu.parallel.distributed import initialize

initialize(
    coordinator_address="@ADDR@",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert jax.process_count() == 2 and len(jax.devices()) == 4
from tests._tiny_bcd import first_batch_loss

loss = first_batch_loss("@ROOT@", global_batch=8)
print(f"proc {jax.process_index()} loss={loss:.8f}", flush=True)
"""


_CC_WORKER = r"""
import os, sys
sys.path.insert(0, "@REPO@")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from change3d_tpu.parallel.distributed import initialize

initialize(
    coordinator_address="@ADDR@",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert jax.process_count() == 2 and len(jax.devices()) == 4
from tests._tiny_cc import caption_eval_scores

scores = caption_eval_scores("@ROOT@")
print(
    f"proc {jax.process_index()} "
    f"Bleu_4={scores['Bleu_4']:.8f} CIDEr={scores['CIDEr']:.8f} "
    f"ROUGE_L={scores['ROUGE_L']:.8f} n_ok", flush=True,
)
"""


def test_two_process_caption_eval_matches_single_process(tmp_path):
    """Multi-host CC eval: two processes, each beam-decoding only its slice
    of every global eval batch, must reconstruct the full hypothesis set via
    allgather and report the same corpus scores as a single-process run."""
    import re

    from tests._tiny_cc import caption_eval_scores, write_caption_dataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "cc")
    write_caption_dataset(root)

    ref = caption_eval_scores(root)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    code = (
        _CC_WORKER.replace("@REPO@", repo).replace("@ADDR@", addr).replace("@ROOT@", root)
    )
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    for metric in ("Bleu_4", "CIDEr", "ROUGE_L"):
        vals = [
            float(re.search(rf"{metric}=([\d.e+-]+)", out).group(1)) for out in outs
        ]
        assert vals[0] == vals[1], (metric, vals)
        assert abs(vals[0] - ref[metric]) < 1e-6, (metric, vals[0], ref[metric])


def test_two_process_bcd_train_step_matches_single_process(tmp_path):
    """End-to-end multi-host training data path: two processes, each decoding
    only its half of every global batch, run one real BCD train step over the
    2-host mesh; the loss must equal a single-process run on the same global
    batch (identical samples + GSPMD cross-host batch-stat/grad reductions)."""
    import re

    from tests._tiny_bcd import first_batch_loss, write_dataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "ds")
    write_dataset(root)

    # Reference: single process, this (8-virtual-device) mesh, unsharded loader.
    ref_loss = first_batch_loss(root, global_batch=8)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    code = (
        _TRAIN_WORKER.replace("@REPO@", repo).replace("@ADDR@", addr).replace("@ROOT@", root)
    )
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    losses = [float(re.search(r"loss=([\d.]+)", out).group(1)) for out in outs]
    assert losses[0] == losses[1]
    assert abs(losses[0] - ref_loss) < 1e-5 * max(abs(ref_loss), 1.0), (losses, ref_loss)


def test_two_process_distributed_init_and_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    code = _WORKER.replace("@REPO@", repo).replace("@ADDR@", addr)
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    assert "proc 0 primary=True ok" in outs[0]
    assert "proc 1 primary=False ok" in outs[1]
