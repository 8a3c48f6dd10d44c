from .dit import (  # noqa: F401
    QwenImageDiTConfig,
    convert_qwen_image_dit_state_dict,
    init_qwen_image_dit_params,
    qwen_image_dit_forward,
)
from .text_encoder import (  # noqa: F401
    QwenVLTextConfig,
    convert_qwen_vl_text_state_dict,
    qwen_vl_text_encode,
)
from .vae import (  # noqa: F401
    convert_qwen_image_vae_state_dict,
    qwen_image_vae_decode,
    qwen_image_vae_encode,
)
