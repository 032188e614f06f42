"""Test config: force CPU with 8 virtual devices so sharding/mesh tests run anywhere
(the fake-mesh analog of the reference's queue shims, see SURVEY.md §4).

Note: the env var JAX_PLATFORMS may be clobbered by sitecustomize on some machines, so
we use jax.config.update (authoritative after import) instead.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
