"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests) and 64-bit precision, before JAX is imported anywhere.

Note: the axon TPU plugin in this image ignores the ``JAX_PLATFORMS``
environment variable, so the platform is also pinned via ``jax.config``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("PGPFA_X64", "1")
# No persistent compilation cache under pytest: CPU test compiles are fast,
# in-process executables are memoized anyway, and writing multi-MB executables
# (zstandard-compressed) has segfaulted flakily late in the suite (observed at
# test_longt.py::test_banded_vi_long_trial_T1000's cache write; the test passes
# in isolation). The cache stays on for TPU runs, where it matters.
os.environ["PGPFA_COMPILE_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_executables_between_modules():
    """Drop compiled XLA executables after each test module.

    The round-3 suite compiles hundreds of programs (several of them huge —
    fused whole-EM scans, T=1000 banded solvers) in one process; with every
    executable held alive by jit caches, XLA:CPU's compiler started
    SEGFAULTING reproducibly ~60 tests in (inside backend_compile_and_load;
    also seen in the compilation-cache write) — cumulative JIT code-memory
    exhaustion, not any single test (each crash site passes in isolation).
    Clearing per MODULE keeps within-module compile reuse (the expensive
    fused programs are reused across a module's tests) while capping the
    resident-executable population.
    """
    yield
    from pgpfa.em.fit import _phase_programs

    _phase_programs.cache_clear()
    jax.clear_caches()
    gc.collect()
