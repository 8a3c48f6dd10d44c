from .dit import (  # noqa: F401
    ZImageDiTConfig,
    convert_z_image_dit_state_dict,
    init_z_image_dit_params,
    z_image_dit_forward,
)
