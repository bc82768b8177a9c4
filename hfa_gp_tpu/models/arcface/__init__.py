from .iresnet import init_iresnet, iresnet_apply, IRESNET_LAYERS  # noqa: F401
from .mobilefacenet import (init_mobilefacenet,  # noqa: F401
                            mobilefacenet_apply, MBF_CONFIGS)
from .registry import (init_backbone, backbone_apply,  # noqa: F401
                       backbone_names, canonical_name)
