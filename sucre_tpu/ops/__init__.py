"""Pure-JAX array ops: SE(3), pinhole projection, dense matching, formation math."""

from sucre_tpu.ops.se3 import (  # noqa: F401
    hat,
    se3_exp,
    matvec3,
    quat_to_rotmat,
    pose_inverse,
    transform_points,
)
from sucre_tpu.ops.pinhole import (  # noqa: F401
    Intrinsics,
    intrinsics_from_K,
    K_from_intrinsics,
    unproject,
    project,
    pixel_grid,
)
