# Import submodules directly (e.g. trase_tpu.data.scene); importing
# Scene here would create a cycle with models.gaussians_io.
