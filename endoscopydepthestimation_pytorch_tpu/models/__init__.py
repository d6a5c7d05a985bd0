from .fcdensenet import (FCDenseNet, FCDenseNet57, FCDenseNet67, FCDenseNet103,  # noqa: F401
                         UNet, center_crop, nearest_upsample_2x, packed_conv3x3)
from .init import reinitialize_params  # noqa: F401
from .torch_import import convert_reference_state_dict, load_reference_checkpoint  # noqa: F401
