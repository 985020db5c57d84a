from spef_tpu.codec.softclass import (  # noqa: F401
    OrientationSoftClassification,
    PositionSoftClassification,
)
from spef_tpu.codec.keypoints import KeyPoints, TANGO_3D_KEYPOINTS  # noqa: F401
from spef_tpu.codec.epnp import epnp_solve, epnp_solve_batch, undistort_points  # noqa: F401
from spef_tpu.codec.facade import SPEUtils  # noqa: F401
