"""Test harness config: CPU backend with an 8-device virtual mesh + int64.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) so sharded == single-device
can be asserted bit-for-bit without TPU pod hardware (SURVEY.md §4).

Note: this machine's sitecustomize registers the (single-client) axon TPU
backend and forces ``jax_platforms="axon,cpu"``; tests must override the
*config* (not just the env var) back to cpu-only, or every pytest run
contends for the TPU tunnel.
"""

import os

if os.environ.get("BHW_TPU_TEST") == "1":
    # Opt-in real-TPU lane (tests/test_tpu_lane.py): keep the axon backend
    # and leave x64 OFF — the production TPU regime (int32 lanes only).
    # The collection hook below restricts the session to the TPU lane so a
    # full-suite invocation with the flag set cannot point 400+ CPU-designed
    # tests at the single-client tunnel.
    import jax  # noqa: F401

    def pytest_collection_modifyitems(config, items):
        items[:] = [i for i in items if "test_tpu_lane" in str(i.fspath)]
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
