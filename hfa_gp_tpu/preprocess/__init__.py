from . import align, bfm, pose, smoothing  # noqa: F401
