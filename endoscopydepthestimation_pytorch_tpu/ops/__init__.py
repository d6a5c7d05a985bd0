from .geometry import (flow_from_depth, images_warping, intrinsics_inverse,  # noqa: F401
                       scale_recovery, warp_coordinates, warp_depth)
from .gridsample import grid_sample_nhwc  # noqa: F401
