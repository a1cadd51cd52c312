"""Test env: force CPU backend with a virtual 8-device mesh.

Must OVERRIDE (not setdefault) the platform: the harness environment pins
JAX_PLATFORMS=axon (the real single-chip TPU tunnel) and a sitecustomize
registers that backend at interpreter start, so the env var alone is not
enough — jax.config.update after import is what actually wins.  Tests
validate semantics on the fake 8-way CPU mesh (SURVEY.md §4); the real chip
is for bench.py only."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
