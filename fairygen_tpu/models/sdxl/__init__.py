from .unet2d import (
    UNet2DConfig,
    unet2d_forward,
    brushnet_forward,
    convert_unet2d_state_dict,
)
