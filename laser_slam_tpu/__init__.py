"""laser_slam_tpu — a TPU-native 2D laser SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++ stack (rising-turtle/laser_slam): polar scan matching,
polar/point-to-line ICP, occupancy-grid mapping, pose-graph SLAM with
loop closure, particle-filter localization, multi-sensor fusion, and a
multi-chip execution path over ``jax.sharding`` meshes.
"""

__version__ = "0.1.0"

from .core import se2
from .core.scan import LaserModel, Scan, LMS151, LMS211, LMS511, PRESETS

__all__ = [
    "se2",
    "LaserModel",
    "Scan",
    "LMS151",
    "LMS211",
    "LMS511",
    "PRESETS",
]
