from .continuous import ContinuousEngine, WanSlotStepper
from .server import (
    BatchingEngine,
    InferenceServer,
    Request,
    sdxl_generate_fn,
    t2i_generate_fn,
)

__all__ = ["BatchingEngine", "ContinuousEngine", "InferenceServer",
           "Request", "WanSlotStepper", "sdxl_generate_fn",
           "t2i_generate_fn"]
