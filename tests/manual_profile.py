"""Capture a jax.profiler device trace of the BCD forward (batch 64, bf16).

Writes to /tmp/change3d_trace; inspect with xprof/tensorboard or parse the
trace.json.gz. Falls back to printing available event summaries.
"""

import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.models.trainer import Change3D, Task

BATCH = 64
model = Change3D(task=Task.BCD, in_height=256, in_width=256)
pre = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 256, 3), jnp.bfloat16)
post = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 256, 256, 3), jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), pre, pre)


def chained(variables, pre, post):
    def body(carry, _):
        out = model.apply(variables, carry, post, train=False)["change"]
        bump = (jnp.sum(out) * 1e-12).astype(carry.dtype)
        return carry + bump, ()

    final, _ = jax.lax.scan(body, pre, None, length=5)
    return jnp.sum(final)


run = jax.jit(chained)
print("warmup:", float(run(variables, pre, post)), flush=True)

logdir = "/tmp/change3d_trace"
jax.profiler.start_trace(logdir)
float(run(variables, pre, post))
jax.profiler.stop_trace()
print("trace written", flush=True)

# Summarize: find trace.json.gz and aggregate event durations by name.
for path in glob.glob(logdir + "/**/*.trace.json.gz", recursive=True):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and "dur" in e]
    by_name = {}
    for e in events:
        key = e.get("name", "?")[:60]
        by_name.setdefault(key, [0, 0.0])
        by_name[key][0] += 1
        by_name[key][1] += e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:40]
    print(f"\n== {path}")
    for name, (n, dur) in top:
        print(f"{dur / 1e3:9.2f} ms  x{n:4d}  {name}")
