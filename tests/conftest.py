import os
import sys

# Force a virtual 8-device CPU mesh for sharding tests and fp64 numerics.
# Must happen before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# the axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; force CPU for
# deterministic fp64 tests + the 8-device virtual mesh
jax.config.update("jax_platforms", "cpu")
