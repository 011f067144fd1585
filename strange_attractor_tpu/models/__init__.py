"""Attractor maps, color transforms, and built-in presets."""

from . import attractors, presets, transforms
from .attractors import Attractor, PolynomialSprott2Degree
from .transforms import AdjustedVelocity, PoissonSaturneTransform, poisson_saturne_transform

__all__ = [
    "Attractor",
    "AdjustedVelocity",
    "PoissonSaturneTransform",
    "PolynomialSprott2Degree",
    "attractors",
    "poisson_saturne_transform",
    "presets",
    "transforms",
]
