import os
import sys

# ---------------------------------------------------------------------------
# The harness environment routes ALL jax work (even CPU-backend compiles)
# through a remote TPU relay via a sitecustomize hook on PYTHONPATH
# (JAX_PLATFORMS=axon, PALLAS_AXON_REMOTE_COMPILE=1).  That makes every
# distinct op compile take ~1s of network wait; the golden tests need
# cheap local float64 CPU execution.  The hook runs at interpreter start,
# so scrubbing env vars here is too late — re-exec pytest once with a
# sanitized environment instead.  TPU execution is exercised separately by
# bench.py / __graft_entry__.py, which keep the environment untouched.
# ---------------------------------------------------------------------------
def _sanitized_env():
    env = dict(os.environ)
    env["GDM_TEST_SANITIZED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(k)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    return env


if os.environ.get("GDM_TEST_SANITIZED") != "1":
    import pytest

    @pytest.hookimpl(tryfirst=True)
    def pytest_configure(config):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(
            sys.executable,
            [sys.executable, "-m", "pytest"] + sys.argv[1:],
            _sanitized_env(),
        )


import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
