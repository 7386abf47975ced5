"""Version information for sleap-tpu."""

__version__ = "0.1.0"
