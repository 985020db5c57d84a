from spef_tpu.data.camera import (  # noqa: F401
    Camera,
    DSPEED_CAMERA,
    SPEED_CAMERA,
    SPEED_PLUS_CAMERA,
    load_camera,
)
