"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference gates its CUDA tests on hardware availability
(``tests/layers/test_binary_linear.py:69``); here instead the whole suite is
CPU-runnable (Pallas kernels run in interpret mode) and multi-chip sharding is
exercised on 8 virtual CPU devices, which the driver separately validates via
``__graft_entry__.dryrun_multichip``.

NOTE: this sandbox's ``sitecustomize`` force-registers the tunneled 'axon'
TPU platform and overrides JAX_PLATFORMS; the ``jax.config.update`` below is
required (not just the env var) to actually run tests on local CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
