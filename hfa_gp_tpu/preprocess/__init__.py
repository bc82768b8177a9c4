from . import align, bfm, pose, smoothing, warp  # noqa: F401
