from .dit import (  # noqa: F401
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    flux_dit_forward,
    init_flux_dit_params,
    prepare_image_ids,
)
