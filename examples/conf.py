"""Shared example configuration.

Parity: reference ``examples/conf.py`` (data directory).
"""

from examples.utils.dataset import data_dir

__all__ = ["data_dir"]
