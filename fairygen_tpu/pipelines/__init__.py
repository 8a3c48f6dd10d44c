from .flux2_image import Flux2ImagePipeline
from .flux_image import ControlNetInput, FluxImagePipeline
from .qwen_image import QwenImagePipeline
from .wan_video import WanVideoPipeline
from .z_image import ZImagePipeline
