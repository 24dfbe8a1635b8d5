"""Multi-host / multi-slice initialization.

Single-slice TPU pods need nothing: `jax.devices()` sees every chip over ICI
and the data mesh in `mesh.py` spans them. Across slices (DCN) or on GPU/CPU
clusters, call `initialize()` once per process before any jax usage; the
Mesh helpers then operate on the global device set transparently. This is
the whole "communication backend": XLA emits the collectives, ICI carries
intra-slice traffic, DCN the rest (SURVEY.md §2.5 — the reference has no
distribution layer at all).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID)."""
    import jax

    if getattr(initialize, "_done", False):
        return
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        # Single-process (one host controls the slice) — nothing to do.
        initialize._done = True
        return
    # Multi-process CPU needs a cross-host collectives implementation or each
    # process silently gets its own single-process client. Set it whenever the
    # platform is (or may default to) CPU — on TPU/GPU the setting is inert,
    # while skipping it on a CPU-default host reproduces the silent-isolation
    # failure.
    platforms = jax.config.jax_platforms
    if platforms is None or "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else int(os.environ.get("PROCESS_ID", "0")),
    )
    if jax.process_count() > 1:
        # Establish the cross-host collective contexts NOW, while every
        # process sits at the same program point. Context creation is lazy
        # (first collective over a given device clique) and has a hard-coded
        # ~30 s peer timeout — if the first collective instead fires after a
        # multi-minute cold compile whose duration skews across hosts
        # (observed with cache-miss recompiles), it dies with "Gloo context
        # initialization failed ... timed out". Later collectives reuse the
        # contexts created here. Two cliques matter: the one-device-per-
        # process allgather (sync/assert_equal paths) and the ALL-devices
        # all-reduce the data-parallel train step compiles to.
        import numpy as np
        from jax.experimental import multihost_utils
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        multihost_utils.sync_global_devices("change3d_distributed_init")
        devices = jax.devices()
        mesh = Mesh(np.asarray(devices), ("warm",))
        local = jax.local_device_count()
        garr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, PartitionSpec("warm")),
            np.ones((local,), np.float32),
        )
        total = jax.jit(
            lambda x: x.sum(), out_shardings=NamedSharding(mesh, PartitionSpec())
        )(garr)
        assert float(total) == len(devices)
    initialize._done = True


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
