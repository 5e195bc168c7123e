from . import cameras, colmap, masks, ply, readers  # noqa: F401
from .scene import Scene  # noqa: F401
