"""Version information for sleap-tpu."""

__version__ = "0.1.0"


def versions() -> str:
    """Print versions of sleap-tpu and key libraries.

    Reference analog: sleap/version.py:17 ``versions`` (TensorFlow there,
    JAX here).
    """
    import platform

    import jax
    import numpy as np

    vers = {
        "sleap-tpu": __version__,
        "JAX": jax.__version__,
        "Numpy": np.__version__,
        "Python": platform.python_version(),
        "OS": platform.platform(),
    }
    out = "\n".join(f"{k}: {v}" for k, v in vers.items())
    print(out)
    return out
