#!/usr/bin/env python
"""Record reference per-block X3D activations from a real ``X3D_L.pyth``.

Run this on ANY machine that has torch + numpy + this repository and the
checkpoint file (no TPU, no JAX needed):

    python tools/record_torch_trace.py /path/to/X3D_L.pyth ref_acts.npz

then verify the converter bit-for-bit on the TPU side:

    python -m change3d_tpu.cli verify-checkpoint \
        --pretrained /path/to/X3D_L.pyth --trace ref_acts.npz

The forward is the repo's independent torch oracle (tests/torch_oracle.py) —
pure torch functional ops built from the architecture specification, itself
parity-tested against the JAX model. The probe input is the canonical seeded
probe from change3d_tpu.checkpoint.verify so both sides agree by
construction. Keep --frames/--height/--width/--seed at their defaults unless
you pass the same values to verify-checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def record_trace(state_dict, *, t: int = 3, h: int = 64, w: int = 64, seed: int = 0):
    """state_dict: torch 'model_state' mapping. Returns {name: np.ndarray}
    with the per-block activations + head logits + probe metadata."""
    import torch

    from change3d_tpu.checkpoint.verify import BLOCK_NAMES, fixed_probe_input
    from change3d_tpu.models.x3d import x3d_l_config
    from tests.torch_oracle import oracle_head, oracle_run_blocks

    cfg = x3d_l_config()
    sd = {
        k: (v if torch.is_tensor(v) else torch.as_tensor(np.asarray(v)))
        for k, v in state_dict.items()
    }
    x = torch.from_numpy(fixed_probe_input(t, h, w, seed))
    with torch.no_grad():
        outs = oracle_run_blocks(x, sd, cfg, num_blocks=5)
        logits = oracle_head(outs[-1], sd, cfg)
    arrays = {name: o.numpy() for name, o in zip(BLOCK_NAMES, outs)}
    arrays["head_logits"] = logits.numpy()
    arrays["probe_json"] = np.asarray(
        json.dumps({"t": t, "h": h, "w": w, "seed": seed})
    )
    return arrays


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="path to X3D_L.pyth")
    ap.add_argument("out", help="output .npz trace path")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt)
    arrays = record_trace(
        state, t=args.frames, h=args.height, w=args.width, seed=args.seed
    )
    np.savez_compressed(args.out, **arrays)
    print(f"wrote {args.out}: " + ", ".join(f"{k}{list(np.shape(v))}" for k, v in arrays.items()))


if __name__ == "__main__":
    main()
