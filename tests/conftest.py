"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding code is validated on
a virtual 8-device CPU platform instead (the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``).

Note: the machine's sitecustomize imports jax at interpreter startup with the
TPU (axon) platform selected, so setting JAX_PLATFORMS here is too late;
instead we update jax.config before any backend is initialized (backends are
created lazily on first use).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compile cache here — writing the
# large CPU executables from inside pytest segfaults in jax's
# zstandard-compressed cache serializer (reproduced twice on this host;
# the standalone CLI/bench processes write the same cache fine).
