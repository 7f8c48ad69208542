"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware
(SURVEY.md §4 item 5).

Note: the environment pre-imports jax with JAX_PLATFORMS=axon (remote TPU
tunnel) via sitecustomize, so plain env vars are too late here — we must
update the jax config directly before any backend is instantiated.
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
