"""Host-side utilities: export, sequencing, profiling, completion."""

from . import export, sequencing

__all__ = ["export", "sequencing"]
