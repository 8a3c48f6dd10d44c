from .dit import (  # noqa: F401
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    flux_dit_forward,
    init_flux_dit_params,
    prepare_image_ids,
)
from .text_encoders import (  # noqa: F401
    convert_flux_clip_state_dict,
    convert_t5_encoder_state_dict,
    flux_clip_l_config,
    flux_encode_prompt_clip,
)
from .vae import convert_flux_vae_state_dict  # noqa: F401
