import sys, time, dataclasses
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from change3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import x3d_l_config
from change3d_tpu.train.engine import create_train_state, make_train_step
from change3d_tpu.train.lr import poly_warmup_schedule
from change3d_tpu.train.optim import torch_adam

BATCH, HW, N = 16, 256, 20
backbone = dataclasses.replace(x3d_l_config(), remat=True)
model = Change3D(task=Task.BCD, in_height=HW, in_width=HW, backbone_cfg=backbone)
rng = np.random.RandomState(0)
batch = {
    "pre": jnp.asarray(rng.randn(BATCH, HW, HW, 3), jnp.bfloat16),
    "post": jnp.asarray(rng.randn(BATCH, HW, HW, 3), jnp.bfloat16),
    "label": jnp.asarray((rng.rand(BATCH, HW, HW, 1) > 0.7), jnp.int32),
}
tx = torch_adam(poly_warmup_schedule(2e-4, 80000, 500), weight_decay=1e-4)
state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
step = make_train_step(model, tx)
key = jax.random.PRNGKey(1)
for _ in range(3):
    state, m = step(state, batch, key)
float(m["loss"])
t0 = time.perf_counter()
for _ in range(N):
    state, m = step(state, batch, key)
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"train step b{BATCH} {HW}^2 bf16 remat: {dt*1e3:.1f} ms/step = {BATCH/dt:.1f} samples/s; loss {float(m['loss']):.4f}")
