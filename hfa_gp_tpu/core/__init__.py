from . import ops, camera  # noqa: F401
