"""Reference-compatible alias for the transform math.

Users migrating from the reference import `robosuite.utils.transform_utils`;
this module exposes the same public names (JAX implementations) from
robosuite_tpu.utils.transforms.
"""

from robosuite_tpu.utils.transforms import (  # noqa: F401
    EPS,
    axisangle2quat,
    convert_quat,
    euler2mat,
    make_pose,
    mat2euler,
    mat2pose,
    mat2quat,
    orientation_error as get_orientation_error,
    pose2mat,
    pose_in_A_to_pose_in_B,
    pose_inv,
    quat2axisangle,
    quat2mat,
    quat_conjugate,
    quat_distance,
    quat_inverse,
    quat_multiply,
    quat_slerp,
    rotation_matrix,
    unit_vector,
)
