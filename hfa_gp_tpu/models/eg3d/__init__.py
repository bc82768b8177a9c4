from .generator import EG3DConfig, init_generator, synthesis, mapping  # noqa: F401
