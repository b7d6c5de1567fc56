"""Scene compiler: declarative builders -> flat SoA device arrays."""

from .builder import SceneBuilder
from .types import SceneData, SceneStats

__all__ = ["SceneBuilder", "SceneData", "SceneStats"]
