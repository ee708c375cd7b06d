"""Small shared utilities for Ray stages."""

from __future__ import annotations

import os


def package_runtime_env() -> dict:
    """runtime_env ensuring Ray workers can import this package even when the
    driver's sys.path was set up manually (workers don't inherit sys.path)."""
    import plugin_serdes_ray

    root = os.path.dirname(os.path.dirname(os.path.abspath(plugin_serdes_ray.__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    return {"env_vars": {"PYTHONPATH": root + (os.pathsep + existing if existing else "")}}
