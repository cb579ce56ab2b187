from mrfa_tpu.ops.grid import (
    make_coordinate_grid,
    coords_grid,
    kp2gaussian,
    to_homogeneous,
    from_homogeneous,
)
from mrfa_tpu.ops.sampler import grid_sample, sample_pixel
from mrfa_tpu.ops.resize import (
    resize_bilinear,
    upsample_nearest,
    downsample_nearest,
    avg_pool,
    gaussian_blur_kernel,
    antialias_downsample,
    AntiAliasParams,
)
from mrfa_tpu.ops.tps import (
    tps_fit,
    tps_warp_coordinates,
    tps_transform_grid,
    random_transform_params,
    random_transform_warp,
    random_transform_frame,
    random_transform_jacobian,
)
