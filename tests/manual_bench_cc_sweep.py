"""Manual (TPU) CC pipeline composition sweep — backs the round-5 CC
throughput push (VERDICT r4 item 1).

Measures, per batch size:
  - encoder-only rate (X3D-L forward to the CC memory tap),
  - decode-only rate (KV-cached greedy decode, 51 worst-case steps),
  - the serial pipeline rate bench_tasks.bench_cc pins,
  - the CHUNKED pipeline rate: encoder at batch b, decode over the
    concatenated memories of `chunk` encoder batches (batch b*chunk) —
    amortizing the decode scan's per-step fixed cost over more samples.

Usage:  python tests/manual_bench_cc_sweep.py [enc|dec|pipe|chunk ...]
Each row prints one JSON line; results feed BENCH_TASKS.json / ARCHITECTURE.md.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

from change3d_tpu.models.caption_decoder import (
    MAX_CAPTION_LEN,
    beam_search_decode,
    make_incremental_fns,
)
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import x3d_l_config

BEAM = 1
FUSED = False  # --fused: admit the full fused Pallas blocks (stages 3 AND
# 4 — BCD's b128 fused rejection only ever covered stage 3; the CC path
# adds 15 stage-4 blocks at 16^2 where per-op overhead is largest)


def build(batch):
    backbone = dataclasses.replace(
        x3d_l_config(), packed_eval_stages=(0,), fused_inference=FUSED
    )
    model = Change3D(task=Task.CC, vocab_size=500,
                     in_height=256, in_width=256, backbone_cfg=backbone)
    pre = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.bfloat16)
    post = jax.random.normal(jax.random.PRNGKey(2), (batch, 256, 256, 3), jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), pre, post, captions=jnp.zeros((batch, 4), jnp.int32)
    )
    return model, variables, pre, post


def _time(run, *args):
    float(run(*args))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        dt = min(dt, time.perf_counter() - t0)
    return dt


def bench_encoder(batch, iters=20):
    model, variables, pre, post = build(batch)

    def chained(pre, n):
        def body(carry, _):
            out = model.apply(variables, carry, post, train=False)["memory"]
            bump = (jnp.sum(out) * 1e-12).astype(carry.dtype)
            return carry + bump, ()

        final, _ = jax.lax.scan(body, pre, None, length=n)
        return jnp.sum(final)

    run = jax.jit(chained, static_argnums=1)
    float(run(pre, 2))
    dt = _time(run, pre, iters)
    return batch * iters / dt


def bench_decode(batch, iters=20):
    """Decode-only: 51-step worst-case greedy over a fixed memory."""
    model, variables, pre, post = build(min(batch, 32))
    incremental = make_incremental_fns(model)

    def apply_tokens(vs, tokens, mem):
        return model.apply(vs, tokens, mem, method=model.decode_captions)

    mem_small = jax.jit(
        lambda vs, a, b: model.apply(vs, a, b, train=False)["memory"]
    )(variables, pre, post)
    reps = (batch + mem_small.shape[0] - 1) // mem_small.shape[0]
    memory = jnp.concatenate([mem_small] * reps, axis=0)[:batch]

    def chained(memory, n):
        def body(carry, _):
            tokens, scores = beam_search_decode(
                apply_tokens, variables, carry, beam_size=BEAM,
                start_token=2, end_token=3, pad_token=0,
                max_len=MAX_CAPTION_LEN, incremental=incremental,
                early_exit=False,
            )
            bump = (jnp.sum(scores) * 1e-12
                    + jnp.sum(tokens).astype(jnp.float32) * 1e-12)
            return carry + bump.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, memory, None, length=n)
        return jnp.sum(final)

    run = jax.jit(chained, static_argnums=1)
    float(run(memory, 2))
    dt = _time(run, memory, iters)
    return batch * iters / dt


def bench_chunked(batch, chunk, iters=8):
    """Encoder at batch b (scan of `chunk` forwards, memories stacked), then
    ONE decode over [b*chunk] memories. samples/sec over b*chunk*iters."""
    model, variables, pre, post = build(batch)
    incremental = make_incremental_fns(model)

    def apply_tokens(vs, tokens, mem):
        return model.apply(vs, tokens, mem, method=model.decode_captions)

    def one_round(carry):
        def enc_body(c, _):
            out = model.apply(variables, c, post, train=False)["memory"]
            bump = (jnp.sum(out) * 1e-12).astype(c.dtype)
            return c + bump, out

        carry, mems = jax.lax.scan(enc_body, carry, None, length=chunk)
        big = mems.reshape(batch * chunk, *mems.shape[2:])
        tokens, scores = beam_search_decode(
            apply_tokens, variables, big, beam_size=BEAM,
            start_token=2, end_token=3, pad_token=0,
            max_len=MAX_CAPTION_LEN, incremental=incremental,
            early_exit=False,
        )
        bump = (jnp.sum(scores) * 1e-12
                + jnp.sum(tokens).astype(jnp.float32) * 1e-12)
        return carry + bump.astype(carry.dtype)

    def chained(pre, n):
        def body(c, _):
            return one_round(c), ()

        final, _ = jax.lax.scan(body, pre, None, length=n)
        return jnp.sum(final)

    run = jax.jit(chained, static_argnums=1)
    float(run(pre, 1))
    dt = _time(run, pre, iters)
    return batch * chunk * iters / dt


def main():
    from bench import probe_backend
    from change3d_tpu.utils.cache import enable_compilation_cache

    err = probe_backend()
    if err:
        print(json.dumps({"error": err}))
        return 1
    enable_compilation_cache()
    argv = sys.argv[1:]
    # --batches 144,160 overrides the per-mode default ladders (probing).
    batches = None
    if "--batches" in argv:
        i = argv.index("--batches")
        batches = tuple(int(x) for x in argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    if "--fused" in argv:
        global FUSED
        FUSED = True
        argv.remove("--fused")
    modes = argv or ["enc", "dec", "pipe", "chunk"]
    if "enc" in modes:
        for b in batches or (32, 64, 96, 128):
            r = bench_encoder(b)
            print(json.dumps({"mode": "encoder_only", "batch": b,
                              "rate": round(r, 1)}), flush=True)
    if "dec" in modes:
        for b in batches or (32, 64, 128, 256):
            r = bench_decode(b)
            print(json.dumps({"mode": "decode_only", "batch": b,
                              "rate": round(r, 1)}), flush=True)
    if "pipe" in modes:
        from bench_tasks import bench_cc

        for b in batches or (32, 64, 96, 128):
            r, _ = bench_cc(b, 10)
            print(json.dumps({"mode": "serial_pipeline", "batch": b,
                              "rate": round(r, 1)}), flush=True)
    if "chunk" in modes:
        for b, c in ((32, 4), (64, 2), (64, 4), (96, 2), (128, 2)):
            r = bench_chunked(b, c)
            print(json.dumps({"mode": "chunked_pipeline", "batch": b,
                              "chunk": c, "rate": round(r, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
