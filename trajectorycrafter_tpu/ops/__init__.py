from trajectorycrafter_tpu.ops.splat import (
    bilinear_splat,
    forward_warp_single,
    transform_points,
)
