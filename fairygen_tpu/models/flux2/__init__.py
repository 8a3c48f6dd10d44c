from .dit import (  # noqa: F401
    Flux2DiTConfig,
    convert_flux2_dit_state_dict,
    flux2_dit_forward,
    init_flux2_dit_params,
)
from .vae import (  # noqa: F401
    convert_flux2_vae_state_dict,
    flux2_vae_decode,
    flux2_vae_encode,
)
