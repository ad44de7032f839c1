from .convops import causal_conv1d, conv, conv_transpose  # noqa: F401
from .pixel_shuffle import pixel_shuffle, smow_shuffle  # noqa: F401
from .pooling import adaptive_avg_pool, avg_pool, max_pool  # noqa: F401
from .resize import resize_linear, resize_nearest  # noqa: F401
from .warp import flow_warp, grid_sample  # noqa: F401
