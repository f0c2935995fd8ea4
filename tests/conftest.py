"""Test harness config.

Per SURVEY.md §4.4 the suite runs on a virtual 8-device CPU mesh
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8) so the
shard_map/mesh paths are exercised without a TPU slice, and with x64 enabled
because the parity path is specified in f64 (SPEC.md §10).

This box preloads a TPU PJRT plugin via a sitecustomize on PYTHONPATH and
initializes that backend eagerly at interpreter startup, so an in-process
platform switch is impossible. The fix: if the wrong backend is live,
re-exec pytest once in a scrubbed environment. The re-exec happens in
pytest_configure (not at import) so pytest's fd-level capture can be torn
down first — otherwise the child would inherit the captured (discarded) fds
and its report would vanish.
"""

import os
import sys

_MARK = "TAC_TEST_REEXECED"


def _wrong_backend() -> bool:
    if os.environ.get(_MARK):
        return False
    if "jax" not in sys.modules:
        return os.environ.get("JAX_PLATFORMS", "cpu") not in ("", "cpu")
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:
        return True


def pytest_configure(config):
    if not _wrong_backend():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()   # restore the real fds before exec
    env = dict(os.environ)
    env[_MARK] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""     # the sitecustomize no-ops on empty
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


if os.environ.get(_MARK) or not _wrong_backend():
    import jax
    jax.config.update("jax_enable_x64", True)
    # Persistent XLA:CPU compile cache: the suite's dominant cost is jit
    # compiles (the vbr-bs clip encode alone is ~100 s cold, ~11 s from
    # cache — measured round 5), and _clear_jit_arena forces re-loads
    # between modules. Key'd by program + flags, so stale entries are
    # unreachable, not wrong; TAC_TEST_JIT_CACHE=  (empty) disables.
    _cache = os.environ.get("TAC_TEST_JIT_CACHE", "/tmp/tac_test_jitcache")
    if _cache:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng(request):
    """Per-test deterministic stream, independent of execution order.

    The old session-scoped rng made every data-dependent assert a
    function of which tests ran BEFORE it in the same process — green in
    one partition, red in another (bit round 5 when the per-module
    suite runner changed the ordering). Seeding by nodeid makes each
    test's draws a pure function of the test itself."""
    import zlib

    seed = zlib.adler32(request.node.nodeid.encode())
    return np.random.default_rng((422, seed))


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_arena():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    with all of them resident, the LLVM JIT eventually segfaults inside
    backend_compile_and_load on the largest program (the huffman x
    blockswitch encode scan) — deterministic at ~150 tests in, and gone
    when the same test runs standalone. Keeping the JIT arena small
    between modules trades some recompilation for not crashing."""
    yield
    try:
        import jax
        jax.clear_caches()
    except Exception:
        pass
