"""Manual timing harness: stage-by-stage latency of the BCD train pipeline
on the attached accelerator. Run: python tests/manual_stage_timing.py"""

import time

import numpy as np

t0 = time.time()


def t(msg):
    print(f"{time.time() - t0:7.1f}s {msg}", flush=True)


import jax

t("jax imported")
from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.train.engine import create_train_state, make_train_step, make_eval_step
from change3d_tpu.train.lr import poly_warmup_schedule
from change3d_tpu.train.optim import torch_adam

t("imports done")
model = Change3D(task=Task.BCD, in_height=64, in_width=64)
rng = np.random.RandomState(0)
batch = {
    "pre": rng.randn(4, 64, 64, 3).astype(np.float32),
    "post": rng.randn(4, 64, 64, 3).astype(np.float32),
    "label": (rng.rand(4, 64, 64, 1) > 0.7).astype(np.int32),
}
tx = torch_adam(poly_warmup_schedule(2e-4, 100, 10), weight_decay=1e-4)
state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
t("init done")
step = make_train_step(model, tx)
s2, m = step(state, batch, jax.random.PRNGKey(1))
jax.block_until_ready(m["loss"])
t(f'first train step done, loss={float(m["loss"]):.4f}')
s2, m = step(s2, batch, jax.random.PRNGKey(1))
jax.block_until_ready(m["loss"])
t("second train step done")
ev = make_eval_step(model)
em = ev(s2, batch)
jax.block_until_ready(em["loss"])
t("eval step done")
