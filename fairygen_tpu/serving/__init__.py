from .continuous import ContinuousEngine, WanSlotStepper
from .t2i_slots import FluxSlotStepper
from .server import (
    BatchingEngine,
    InferenceServer,
    Request,
    sdxl_generate_fn,
    t2i_generate_fn,
)

__all__ = ["BatchingEngine", "ContinuousEngine", "FluxSlotStepper",
           "InferenceServer", "Request", "WanSlotStepper",
           "sdxl_generate_fn", "t2i_generate_fn"]
