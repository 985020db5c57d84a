from spef_tpu.models.mobilenet_v2 import MobileNetV2, SmallBackbone, SmallMobile  # noqa: F401
from spef_tpu.models.heads import KeypointRegressionHead, URSONetHead  # noqa: F401
from spef_tpu.models.wrapper import ModelWrapper, SPEModel, import_model, save_model  # noqa: F401
