"""Multi-device parallelism: mesh sharding and collective canvas merging."""

from . import mesh

__all__ = ["mesh"]
