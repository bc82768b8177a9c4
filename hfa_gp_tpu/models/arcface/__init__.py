from .iresnet import init_iresnet, iresnet_apply, IRESNET_LAYERS  # noqa: F401
from .mobilefacenet import init_mobilefacenet, mobilefacenet_apply  # noqa: F401
