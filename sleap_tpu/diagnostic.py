"""``sleap-diagnostic``: environment summary.

Rebuild of ``/root/reference/sleap/diagnostic.py`` for the JAX/TPU stack.
"""

from __future__ import annotations

import platform
import sys


def system_summary() -> str:
    lines = [
        f"sleap-tpu version: {__import__('sleap_tpu').__version__}",
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        try:
            devices = jax.devices()
            lines.append(f"devices: {[str(d) for d in devices]}")
            lines.append(f"default backend: {jax.default_backend()}")
        except Exception as e:
            lines.append(f"devices: unavailable ({e})")
    except ImportError:
        lines.append("jax: NOT INSTALLED")
    for mod in ("flax", "optax", "numpy", "h5py", "cv2"):
        try:
            m = __import__(mod)
            lines.append(f"{mod}: {getattr(m, '__version__', 'unknown')}")
        except ImportError:
            lines.append(f"{mod}: NOT INSTALLED")
    return "\n".join(lines)


def use_cpu_only() -> None:
    """Force JAX onto CPU (mirrors ``sleap.use_cpu_only``)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(args=None) -> None:
    print(system_summary())


if __name__ == "__main__":
    main()
