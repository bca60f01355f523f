"""Test configuration: force an 8-fake-device CPU platform (SURVEY.md §5.2
"Distributed without a cluster") so the full Mesh/shard_map/psum code path
runs in CI without TPU hardware. Pallas kernels run in interpret mode on CPU
via the ops dispatcher.

Note: this environment's sitecustomize registers the `axon` TPU-tunnel
backend and forces jax_platforms="axon,cpu" in EVERY python process, so the
JAX_PLATFORMS env var alone is not enough — we override the config after
import, before any backend initializes. Set HGMM_TEST_TPU=1 to run the test
suite on the real TPU chip instead.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("HGMM_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_compiled_program_caches():
    """Release compiled executables between test modules.

    The full suite compiles several hundred programs onto the 8-fake-device
    CPU client in one process; with the round-5 cached program factories
    (parallel.sharded, pipelines.pose_graph) keeping their executables
    alive, this environment's XLA CPU client segfaults deterministically
    inside a later backend_compile (observed 3x at test_register after
    ~110 tests; 125 GB RAM free, so a client resource limit, not OOM).
    Clearing JAX's global compilation caches per module caps the number of
    live executables; cross-module shape reuse is minimal, so the recompile
    cost is noise."""
    yield
    jax.clear_caches()
    gc.collect()
