"""Device-init preflight: never hang on a dead TPU tunnel.

The axon TPU plugin retries its relay tunnel forever if the tunnel
daemon has died (observed: killed by the kernel OOM reaper under host
memory pressure), so ``jax.devices()`` blocks indefinitely with no
error and no CPU fallback. Probing in a throwaway subprocess bounds the
damage; callers then pin the CPU platform explicitly (env var AND
config update — the container's sitecustomize can override the env var
alone)."""

from __future__ import annotations

import os
import subprocess
import sys


def device_init_ok(timeout_s: int = 150) -> bool:
    """True when default-platform JAX device init completes in a
    subprocess within ``timeout_s``. Skips the probe (returns True)
    when the caller already pinned CPU."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, timeout=timeout_s, text=True)
        return "ok" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def pin_cpu() -> None:
    """Force the CPU platform (both knobs, required on this runtime)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def require_device_or_cpu(warn_stream=None) -> bool:
    """Preflight and fall back: returns True when the default device is
    usable (including an explicit CPU request, which gets fully pinned),
    else pins CPU and returns False."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        pin_cpu()  # honor the request against sitecustomize overrides
        return True
    if device_init_ok():
        return True
    stream = warn_stream or sys.stderr
    print("WARNING: device init timed out (dead TPU tunnel?) — "
          "falling back to JAX_PLATFORMS=cpu", file=stream)
    pin_cpu()
    return False
