#!/bin/bash
# Test runner: forces the CPU backend with 8 virtual devices so sharded
# code paths are exercised without TPU hardware. The axon sitecustomize
# (PYTHONPATH) pre-imports jax and registers the TPU backend in every
# python process, so it must be cleared for CPU tests.
cd "$(dirname "$0")"
exec env PYTHONPATH="$(pwd)" PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -q "$@"
