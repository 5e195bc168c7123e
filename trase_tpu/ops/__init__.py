from . import knn, projection, rasterize, rasterize_ref, ssim  # noqa: F401
