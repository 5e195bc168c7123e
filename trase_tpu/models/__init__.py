from . import deform, gaussians  # noqa: F401
