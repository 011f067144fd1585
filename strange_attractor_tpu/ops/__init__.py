"""Device-side compute ops: projection, binning, colorize.

Submodules are imported lazily by their users to avoid import cycles with
``config`` (which needs ``ops.projection``).
"""

from . import projection

__all__ = ["binning", "colorize", "projection"]


def __getattr__(name):
    if name in ("binning", "colorize"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
