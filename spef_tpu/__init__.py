"""spef_tpu — TPU-native spacecraft pose estimation framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
possoj/Spacecraft-Pose-Estimation-Framework: training, quantizing and
deploying CNNs for monocular 6-DoF spacecraft pose estimation on TPU.
"""

__version__ = "0.1.0"
