"""Test harness setup: force an 8-device CPU JAX backend (SURVEY.md §5 item 3).

The image's sitecustomize eagerly registers + initializes the experimental
``axon`` TPU PJRT backend at interpreter startup, so env vars alone are too
late by the time conftest runs. Instead we clear the initialized backends and
re-point JAX at a CPU platform faked to 8 devices — the v5e-8 stand-in for
multi-chip tests (the local machine has exactly 1 real TPU chip).
"""

import os

_DEVCOUNT_FLAG = "--xla_force_host_platform_device_count=8"

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " " + _DEVCOUNT_FLAG).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Backends are initialized lazily at the first jax API call; pointing the
# config at cpu *before* that first call makes the CPU client pick up the
# forced 8-device XLA flag. The clear path below is a best-effort fallback
# in case something initialized a backend before conftest ran.
jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu":
    from jax._src import xla_bridge

    xla_bridge._clear_backends()
    xla_bridge.get_backend.cache_clear()

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

# Persistent compilation cache for the CPU test mesh: repeated full-suite
# runs skip recompiling the (many) jitted programs. Kept separate from the
# TPU bench cache (.jax_cache) so neither evicts the other's entries.
# Accepted tradeoff vs __graft_entry__'s CPU-dryrun policy: XLA:CPU AOT
# reload can in principle SIGILL on a machine-feature change; this cache
# only serves LOCAL test iteration (the driver never runs pytest) — if a
# suite run ever SIGILLs, delete .jax_cache_cpu/ or set MMB_NO_CPU_CACHE=1.
if not os.environ.get("MMB_NO_CPU_CACHE"):
    from mmbidaf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_cpu",
        )
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    """Fresh seeded generator PER TEST. Session scope here was a measured
    mistake: a shared stateful generator couples every test's inputs to
    which tests ran before it, so ADDING a test shifted inputs suite-wide
    and turned borderline tolerances into order-dependent flakes
    (test_bf16_decode_parity, 2026-08-17). Function scope makes each
    test's inputs a pure function of the seed."""
    return np.random.default_rng(224)


@pytest.fixture(scope="session")
def eight_device_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from mmbidaf_tpu.parallel import make_mesh

    return make_mesh()
