from .flux_image import FluxImagePipeline
from .wan_video import WanVideoPipeline
