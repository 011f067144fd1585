"""Multi-device parallelism: mesh sharding and collective canvas merging.

``distributed`` (multi-host bring-up) is imported lazily: it must stay
importable BEFORE the XLA backend initializes (jax.distributed requirement).
"""

from . import mesh

__all__ = ["distributed", "mesh"]


def __getattr__(name):
    if name == "distributed":
        import importlib

        return importlib.import_module(".distributed", __name__)
    raise AttributeError(name)
