"""WindowTracer: --profile_dir step-window tracing (utils/profiling.py)."""

import os

import jax
import jax.numpy as jnp

from change3d_tpu.utils.profiling import WindowTracer


def _tree_files(root):
    return [
        os.path.join(d, f) for d, _, fs in os.walk(root) for f in fs
    ]


def test_window_tracer_captures_one_window(tmp_path):
    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.ones((128,))
    tracer = WindowTracer(logdir, start=2, n=2)
    for i in range(6):
        tracer.tick(i)
        float(f(x))
    tracer.close()
    assert _tree_files(logdir), "no trace files written"
    # One window only: later ticks past the window must not restart it.
    tracer.tick(10)
    assert tracer._done and not tracer._on


def test_window_tracer_inert_without_logdir():
    tracer = WindowTracer(None)
    for i in range(20):
        tracer.tick(i)
    tracer.close()  # no-op


def test_window_tracer_close_stops_short_run(tmp_path):
    logdir = str(tmp_path / "trace")
    tracer = WindowTracer(logdir, start=0, n=100)
    tracer.tick(0)  # window opens, run ends before it fills
    float(jax.jit(lambda x: x + 1)(jnp.ones(())))
    tracer.close()
    assert tracer._done
    assert _tree_files(logdir)
