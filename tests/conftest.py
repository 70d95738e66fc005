"""Test harness config: run everything on a virtual 8-device CPU mesh.

This is the JAX substitute for a "fake backend" distributed test rig
(SURVEY.md §4): sharded code paths are exercised without TPU hardware.
Must set flags before jax initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) pre-imports jax
# and registers the TPU backend before conftest runs; use run_tests.sh,
# which clears it. Fail fast with a clear message otherwise.
if "jax" in sys.modules:
    import jax
    if any(d.platform != "cpu" for d in jax.devices()):
        raise RuntimeError(
            "jax was pre-initialized on a non-CPU backend; run tests via "
            "./run_tests.sh (clears the axon sitecustomize).")
