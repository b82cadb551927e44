from . import image, dense_sfm  # noqa: F401
