from synfmc_tpu.geometry.euler import (
    euler_to_matrix,
    euler_to_matrix_v2,
    to_radian,
)
from synfmc_tpu.geometry.relative import (
    absolute_from_relative_cams,
    relative_cams_to_first,
    relative_obj_to_cam,
)
from synfmc_tpu.geometry.plucker import plucker_embedding

__all__ = [
    "euler_to_matrix",
    "euler_to_matrix_v2",
    "to_radian",
    "relative_cams_to_first",
    "relative_obj_to_cam",
    "absolute_from_relative_cams",
    "plucker_embedding",
]
