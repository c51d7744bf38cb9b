from trajectorycrafter_tpu.geometry.cameras import (
    default_c2w,
    intrinsics_matrix,
    sphere2pose,
)
from trajectorycrafter_tpu.geometry.interpolate import (
    interpolate_intrinsics,
    interpolate_poses,
    slerp,
)
from trajectorycrafter_tpu.geometry.trajectory import (
    generate_traj_specified,
    generate_traj_txt,
    txt_interpolation,
)
from trajectorycrafter_tpu.geometry.warper import Warper, forward_warp
