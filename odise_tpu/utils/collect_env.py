"""Environment report for logs (reference odise/utils/collect_env.py)."""

from __future__ import annotations

import os
import platform
import sys


def collect_env_info() -> str:
    lines = [
        f"sys.platform: {sys.platform}",
        f"Python: {sys.version.replace(chr(10), ' ')}",
        f"numpy: {__import__('numpy').__version__}",
        f"platform: {platform.platform()}",
    ]
    try:
        import jax

        lines += [
            f"jax: {jax.__version__}",
            f"jax backend: {jax.default_backend()}",
            f"jax devices: {[str(d) for d in jax.devices()]}",
        ]
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: unavailable ({e})")
    try:
        import flax
        import optax

        lines += [f"flax: {flax.__version__}", f"optax: {optax.__version__}"]
    except Exception:
        pass
    for var in ("JAX_PLATFORMS", "XLA_FLAGS", "TPU_WORKER_HOSTNAMES"):
        if os.environ.get(var):
            lines.append(f"{var}: {os.environ[var]}")
    return "\n".join(lines)
