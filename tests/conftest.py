"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference offers no test precedent (SURVEY.md §4); we follow its plan:
numpy oracles for pure functions, synthetic-scene regression, and
multi-device sharding tests on spoofed CPU devices.
"""

import os

# XLA_FLAGS must be set before jax initializes its backends. The tunneled
# TPU plugin (sitecustomize register()) ignores the JAX_PLATFORMS env var,
# so the platform is forced through jax.config after import. Set
# TSAR_TEST_TPU=1 to run the suite on real hardware instead.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("TSAR_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache on the CPU suite. Two independent
# failure classes were isolated (round 4): (a) /tmp is a fleet-shared
# volume and deserializing another machine's XLA:CPU AOT executable
# segfaults (cpu_aot_loader warns SIGILL on feature mismatch; crash in
# compilation_cache.get_executable_and_time); (b) even with a fresh
# machine-private cache, SERIALIZING one of the e2e pipeline programs
# segfaults the CPU backend (crash in put_executable_and_time,
# test_cli_pmvs). The suite therefore compiles fresh and relies on
# jax's in-process cache; opt back in with TSAR_JAX_CACHE (at your own
# risk) or TSAR_TEST_TPU (the TPU cache has been stable all round).
if os.environ.get("TSAR_JAX_CACHE") or os.environ.get("TSAR_TEST_TPU"):
    from tsar_mvs_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def scene():
    from tsar_mvs_tpu.utils.synthetic import make_scene
    return make_scene(height=96, width=128, num_views=5, seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
