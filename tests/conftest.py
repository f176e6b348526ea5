"""Test environment: force an 8-device CPU mesh so sharding tests run
anywhere (the driver validates the real multi-chip path separately via
__graft_entry__.dryrun_multichip).

Note: this image's sitecustomize registers the remote-TPU ("axon") platform
and prepends it to jax_platforms, so JAX_PLATFORMS=cpu in the environment is
not enough — the config must be overridden after importing jax but before any
backend initialises.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_caches():
    """XLA:CPU segfaults compiling large wavefront programs ONLY when
    ~100 tests' jit caches have accumulated in-process (round-3 finding,
    CLAUDE.md; round 4 reproduced it on the non-AD wavefront after the
    segmented-reduction accumulator grew the compiled program).  Clearing
    at module boundaries bounds the cache pressure at negligible
    recompile cost (cross-module jit sharing is minimal)."""
    jax.clear_caches()
    yield
