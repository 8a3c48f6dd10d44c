from .dtypes import DTypePolicy, default_policy
from .io import (
    load_safetensors,
    save_safetensors,
    load_torch_pickle,
    hash_state_dict_keys,
    hash_model_file,
)
from .registry import ModelRegistry, ModelSpec, MODEL_REGISTRY
from .model_config import (
    ModelConfig,
    resolve_model_paths,
    register_download_backend,
)
from .meshes import make_mesh, AxisNames
from .imaging import (
    check_resize_height_width,
    preprocess_image,
    preprocess_video,
    postprocess_video,
    image_crop_and_resize,
)
from .noise import generate_noise
