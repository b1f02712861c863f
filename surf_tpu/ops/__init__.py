from .grid_sample import (
    bilinear_sample_2d,
    pack_bilinear_corners,
    bilinear_sample_packed,
    nearest_sample_2d,
    trilinear_sample_3d,
    trilinear_sample_3d_cm,
    pack_trilinear_corners,
    trilinear_sample_packed_3d,
    nearest_sample_3d,
    lookup_volume,
    resize_bilinear_2d,
    upsample_trilinear_x2,
)
from .projection import (
    to_homo,
    world_to_cam,
    cam_to_pixel,
    project_points,
    pixel_to_normalized,
    in_frustum_mask,
    pixels_to_rays,
    ray_z_cos,
    compute_ray_diff,
    make_pixel_grid,
)
from .embedder import embedder
