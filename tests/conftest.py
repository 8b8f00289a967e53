import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware.  The container's sitecustomize imports jax at
# interpreter start with JAX_PLATFORMS=axon, so setting env vars here is too
# late for the platform choice — override via jax.config instead (XLA_FLAGS
# still applies because no CPU backend has been instantiated yet).
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests must NEVER touch the TPU tunnel: sitecustomize dials the axon relay
# (claiming the single TPU grant) in EVERY python process when
# PALLAS_AXON_POOL_IPS is set — including the CLI/orchestrator subprocesses
# tests spawn.  A suite run would then serialize against (and wedge) any
# concurrent real-TPU benchmark.  Clearing the var here makes every child
# process CPU-only and tunnel-free.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
