#!/usr/bin/env python
"""Diagnose int8 eval memory: compiled-program memory analysis fp32 vs int8.

int8 eval OOMs at batch >= 96 while fp32 fits at 128 (2026-08-18). Hypothesis:
int8 convs materialize int32 accumulator buffers (4 B/elem) where the bf16
path writes 2 B/elem, doubling transient liveness on the big stage-1 maps.
This prints XLA's own memory analysis for a single BCD forward at the given
batch so the hog is named, not guessed.

Usage: python tests/manual_quant_mem.py [batch] [fp32|int8|int8s]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mode = sys.argv[2] if len(sys.argv) > 2 else "int8s"

    import jax
    import jax.numpy as jnp

    from change3d_tpu.models.trainer import Change3D, Task
    from change3d_tpu.models.x3d import x3d_l_config
    from change3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    backbone = dataclasses.replace(
        x3d_l_config(),
        packed_eval_stages=(0,),
        quantized_eval=mode != "fp32",
        quant_mode="static" if mode == "int8s" else "dynamic",
    )
    model = Change3D(task=Task.BCD, in_height=256, in_width=256, backbone_cfg=backbone)
    pre = jnp.zeros((batch, 256, 256, 3), jnp.bfloat16)
    post = jnp.zeros((batch, 256, 256, 3), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), pre, post))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    if mode == "int8s":
        from change3d_tpu.inference import calibrate_quant_scales

        calib = [(jnp.ones(pre.shape, jnp.bfloat16), jnp.ones(post.shape, jnp.bfloat16))]
        variables = {**variables, "quant": calibrate_quant_scales(model, variables, calib)}

    def fwd(variables, pre, post):
        return model.apply(variables, pre, post, train=False)["change"]

    compiled = jax.jit(fwd).lower(variables, pre, post).compile()
    ma = compiled.memory_analysis()
    rec = {"batch": batch, "mode": mode}
    if ma is not None:
        for k in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(ma, k, None)
            if v is not None:
                rec[k] = int(v)
        rec["temp_gb"] = round(rec.get("temp_size_in_bytes", 0) / 2**30, 2)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
