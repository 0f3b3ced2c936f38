import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware (the driver separately dry-runs the multi-chip path).
# NOTE: the env var alone is NOT enough here — the axon sitecustomize
# registers the TPU PJRT plugin and re-forces JAX_PLATFORMS=axon, which
# silently routed "CPU" tests through the TPU tunnel (emulated f64,
# remote compiles, ~100x slower).  jax.config.update after import wins.
os.environ["JAX_PLATFORMS"] = "cpu"
# silence XLA:CPU AOT-cache machine-feature mismatch spam (the persistent
# cache stores host-feature strings that differ between virtualized runs)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: multi-process / large-shape tests")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """This jaxlib's XLA:CPU segfaults once enough live compiled
    programs accumulate in one process (the crash point moves with the
    number of compiled pipelines; reproduced with and without the
    persistent disk cache).  Dropping the in-memory executables between
    test modules keeps the population below the trigger; the disk cache
    makes the recompiles cheap."""
    yield
    jax.clear_caches()
