"""Backend/platform selection helpers for tool entry points.

The environment may pin JAX to a TPU plugin that *overrides* the
``JAX_PLATFORMS`` environment variable at import time (CLAUDE.md: the axon
plugin does).  The only honored form is ``jax.config.update`` issued after
``import jax`` but **before the first backend-initializing call** (on
jax 0.9 the update is a silent no-op once a backend exists).  Every tool
calls :func:`honor_jax_platforms_env` first thing so that
``JAX_PLATFORMS=cpu python tools/...`` behaves as documented — mirroring
how the reference test driver must run identically everywhere
(ref ``test/scripts/test-sparsex.sh.in:40-56``).
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Apply ``JAX_PLATFORMS`` via jax.config before backend init."""
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def force_cpu(min_devices: int = 0) -> None:
    """Switch to the host CPU backend (virtual multi-device mesh).

    Must run before any backend-initializing jax call.  ``min_devices``
    additionally requests a virtual device count via XLA_FLAGS when the
    flag is absent (effective only if no CPU backend exists yet).
    """
    if min_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{min_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
