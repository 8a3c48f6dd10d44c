from .dit import (  # noqa: F401
    QwenImageDiTConfig,
    convert_qwen_image_dit_state_dict,
    init_qwen_image_dit_params,
    qwen_image_dit_forward,
)
