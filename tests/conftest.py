"""Test configuration: force an 8-virtual-device CPU platform before JAX loads.

This is the TPU-world analog of a fake backend (SURVEY.md §4): multi-chip
sharding tests run on a virtual CPU mesh, mirroring how the driver validates
``dryrun_multichip``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image pins JAX_PLATFORMS=axon and the plugin re-asserts it during init,
# so the env var alone is not enough — override via jax.config too.
import jax

jax.config.update("jax_platforms", "cpu")
