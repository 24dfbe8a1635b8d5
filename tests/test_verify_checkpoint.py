"""End-to-end checkpoint parity harness on a synthetic X3D_L.pyth.

Exercises the exact flow documented for the real asset: torch-serialized
checkpoint -> tools/record_torch_trace.py (torch oracle forward) ->
``cli verify-checkpoint --trace`` (strict convert + per-block JAX forward +
comparison). A perturbed checkpoint must FAIL the comparison.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from change3d_tpu.cli import main as cli_main
from tests.torch_oracle import make_random_x3d_state_dict
from tools.record_torch_trace import record_trace

HW = 32  # smallest size divisible by the 4 stage strides with non-trivial maps


@pytest.fixture(scope="module")
def synthetic_pyth(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    sd = make_random_x3d_state_dict(seed=3)
    path = root / "X3D_L.pyth"
    torch.save({"model_state": sd, "epoch": 0}, str(path))
    trace = root / "ref_acts.npz"
    np.savez_compressed(trace, **record_trace(sd, t=3, h=HW, w=HW))
    return str(path), str(trace)


def test_verify_checkpoint_passes_on_matching_trace(synthetic_pyth, tmp_path, capsys):
    path, trace = synthetic_pyth
    report_path = str(tmp_path / "report.json")
    # The random synthetic weights amplify activations to ~1e11 by stage 4
    # (no Kinetics-trained normalization), so fp32 reduction-order noise needs
    # a looser rtol than the real-checkpoint default.
    rc = cli_main([
        "verify-checkpoint", "--pretrained", path, "--trace", trace,
        "--height", str(HW), "--width", str(HW), "--report", report_path,
        "--rtol", "1e-2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "parity vs trace: PASS" in out
    with open(report_path) as f:
        report = json.load(f)
    assert report["all_pass"] is True
    assert report["strict_load"] is True
    assert set(report["blocks"]) == {
        "block0_stem", "block1_stage1", "block2_stage2", "block3_stage3",
        "block4_stage4", "head_logits",
    }
    for e in report["blocks"].values():
        assert e["pass"] and e["rel_err"] < 1e-2


def test_verify_checkpoint_fails_on_perturbed_weights(synthetic_pyth, tmp_path, capsys):
    path, trace = synthetic_pyth
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state"]
    sd["blocks.2.res_blocks.0.branch2.conv_b.weight"] = (
        sd["blocks.2.res_blocks.0.branch2.conv_b.weight"] + 0.05
    )
    bad = str(tmp_path / "bad.pyth")
    torch.save({"model_state": sd}, bad)
    rc = cli_main([
        "verify-checkpoint", "--pretrained", bad, "--trace", trace,
        "--height", str(HW), "--width", str(HW),
    ])
    assert rc == 1
    out = capsys.readouterr().out
    assert "FAIL" in out
    # The perturbation is in stage 2: stem and stage 1 still PASS.
    assert "block0_stem" in out


def test_verify_checkpoint_without_trace_reports_stats(synthetic_pyth, capsys):
    path, _ = synthetic_pyth
    rc = cli_main([
        "verify-checkpoint", "--pretrained", path,
        "--height", str(HW), "--width", str(HW),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "no trace given" in out and "strict conversion: OK" in out


def test_verify_checkpoint_process_exit_code(synthetic_pyth, tmp_path):
    # The documented shell gate `python -m change3d_tpu.cli verify-checkpoint
    # ... && deploy` must see a non-zero exit status on parity FAIL.
    import os
    import subprocess
    import sys

    path, trace = synthetic_pyth
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state"]
    sd["blocks.2.res_blocks.0.branch2.conv_b.weight"] = (
        sd["blocks.2.res_blocks.0.branch2.conv_b.weight"] + 0.05
    )
    bad = str(tmp_path / "bad.pyth")
    torch.save({"model_state": sd}, bad)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # CPU-only subprocess: drop any accelerator-plugin entries from
    # PYTHONPATH so JAX_PLATFORMS=cpu sticks (a loaded TPU plugin re-asserts
    # its platform during init).
    extra = os.pathsep.join(
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=repo + (os.pathsep + extra if extra else ""),
    )
    proc = subprocess.run(
        [sys.executable, "-m", "change3d_tpu.cli", "verify-checkpoint",
         "--pretrained", bad, "--trace", trace,
         "--height", str(HW), "--width", str(HW)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr


def test_verify_checkpoint_rejects_probe_mismatch(synthetic_pyth):
    path, trace = synthetic_pyth
    with pytest.raises(ValueError, match="probe"):
        cli_main([
            "verify-checkpoint", "--pretrained", path, "--trace", trace,
            "--height", "64", "--width", "64",
        ])
