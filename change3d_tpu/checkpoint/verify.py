"""Real-checkpoint parity harness.

The converter (checkpoint/convert.py) is strict about key names and shapes,
but "the converter should work" and "the converter is known to work on the
real X3D_L.pyth" are different claims. This module closes the gap the day the
real asset appears (ref load path: /root/reference/model/trainer.py:44-45):

1. ``verify_checkpoint(path)`` strict-converts the .pyth, runs a per-block
   forward (stem, stage1..4, Kinetics head) on a canonical seeded probe
   input, and reports per-block activation statistics.
2. With ``trace=ref_acts.npz`` (recorded on any torch machine with
   ``tools/record_torch_trace.py``) it additionally compares every block's
   activations against the recorded reference and reports max-abs/relative
   errors with a pass/fail verdict.

CLI: ``python -m change3d_tpu.cli verify-checkpoint --pretrained X3D_L.pyth
[--trace ref_acts.npz] [--report report.json]``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Optional

import numpy as np

# Parity bar: fp32 XLA vs torch convolutions differ only by reduction order;
# the deepest tap (25-block stage 3) accumulates to ~1e-4 relative.
DEFAULT_RTOL = 1e-3
DEFAULT_ATOL = 1e-4

BLOCK_NAMES = ("block0_stem", "block1_stage1", "block2_stage2", "block3_stage3", "block4_stage4")


def fixed_probe_input(t: int = 3, h: int = 64, w: int = 64, seed: int = 0) -> np.ndarray:
    """Canonical probe: torch-layout [1, 3, T, H, W] float32, RandomState(seed).
    Both the torch recorder and the JAX side derive their inputs from this."""
    rng = np.random.RandomState(seed)
    return rng.randn(1, 3, t, h, w).astype(np.float32)


def capture_block_activations(backbone_variables: Dict, cfg, x_ncdhw: np.ndarray) -> Dict[str, np.ndarray]:
    """Eval-mode per-block forward through our X3D; returns activations in the
    torch NCDHW layout (for direct comparison with a recorded torch trace),
    plus the Kinetics head logits."""
    import jax
    import jax.numpy as jnp

    from change3d_tpu.models.x3d import X3D

    model = X3D(cfg)
    x = jnp.asarray(np.transpose(x_ncdhw, (0, 2, 3, 4, 1)))  # -> NDHWC

    def run(m, x):
        outs = []
        for i in range(5):
            x = m.run_block(i, x, train=False)
            outs.append(x)
        return outs, m.head(x, train=False)

    # Parity demands true fp32 convolutions: on TPU the default precision
    # runs fp32 convs as bf16x bf16 passes, which injects ~1e-2 errors that
    # would swamp the converter signal this harness exists to measure.
    with jax.default_matmul_precision("highest"):
        outs, logits = model.apply(backbone_variables, x, method=run)
    acts = {
        name: np.transpose(np.asarray(o), (0, 4, 1, 2, 3))
        for name, o in zip(BLOCK_NAMES, outs)
    }
    acts["head_logits"] = np.asarray(logits)
    return acts


def _count_params(tree) -> int:
    import jax

    return sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(tree))


def verify_checkpoint(
    pretrained: str,
    trace: Optional[str] = None,
    *,
    t: int = 3,
    h: int = 64,
    w: int = 64,
    seed: int = 0,
    rtol: float = DEFAULT_RTOL,
    atol: float = DEFAULT_ATOL,
) -> Dict:
    """Strict-convert ``pretrained`` and produce a parity report dict.

    Report structure:
      {"strict_load": true, "n_params": ..., "probe": {...},
       "blocks": {name: {"shape", "mean", "std", ["max_abs_err",
                         "rel_err", "pass"]}},
       "trace": path-or-null, "all_pass": bool-or-null}
    """
    from change3d_tpu.checkpoint.convert import load_x3d_pretrained
    from change3d_tpu.models.x3d import x3d_l_config

    cfg = x3d_l_config()
    converted = load_x3d_pretrained(pretrained, cfg)  # strict: raises on any mismatch
    report: Dict = {
        "strict_load": True,
        "checkpoint": pretrained,
        "n_params": _count_params(converted["params"]),
        "probe": {"t": t, "h": h, "w": w, "seed": seed},
        "trace": trace,
        "blocks": {},
        "all_pass": None,
    }

    ref = None
    if trace is not None:
        ref = dict(np.load(trace))
        probe = json.loads(str(ref.pop("probe_json")))
        if probe != report["probe"]:
            raise ValueError(
                f"trace was recorded with probe {probe}, harness is using "
                f"{report['probe']} — pass matching --frames/--height/--width/--seed"
            )

    x = fixed_probe_input(t, h, w, seed)
    acts = capture_block_activations(converted, cfg, x)

    all_pass = True
    for name, a in acts.items():
        entry = {
            "shape": list(a.shape),
            "mean": float(a.mean()),
            "std": float(a.std()),
        }
        if ref is not None:
            if name not in ref:
                raise ValueError(f"trace is missing array {name!r}")
            r = np.asarray(ref[name], np.float32)
            if r.shape != a.shape:
                raise ValueError(f"{name}: trace shape {r.shape} != ours {a.shape}")
            err = np.abs(a - r)
            denom = np.maximum(np.abs(r), 1e-6)
            entry["max_abs_err"] = float(err.max())
            entry["rel_err"] = float((err / denom).max())
            entry["pass"] = bool(np.allclose(a, r, rtol=rtol, atol=atol))
            all_pass &= entry["pass"]
        report["blocks"][name] = entry
    if ref is not None:
        report["all_pass"] = bool(all_pass)
    return report


def format_report(report: Dict) -> str:
    lines = [
        f"checkpoint: {report['checkpoint']}",
        f"strict conversion: {'OK' if report['strict_load'] else 'FAILED'} "
        f"({report['n_params']:,} params)",
        f"probe: {report['probe']}",
    ]
    for name, e in report["blocks"].items():
        row = f"  {name:<16} {str(e['shape']):<24} mean {e['mean']:+.4f} std {e['std']:.4f}"
        if "pass" in e:
            row += (
                f"  max_abs {e['max_abs_err']:.3e} rel {e['rel_err']:.3e} "
                f"{'PASS' if e['pass'] else 'FAIL'}"
            )
        lines.append(row)
    if report["all_pass"] is not None:
        lines.append(f"parity vs trace: {'PASS' if report['all_pass'] else 'FAIL'}")
    else:
        lines.append(
            "no trace given — record one with tools/record_torch_trace.py on any "
            "machine with torch + the checkpoint, then re-run with --trace"
        )
    return "\n".join(lines)
