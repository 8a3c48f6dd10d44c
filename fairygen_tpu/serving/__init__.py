from .continuous import ContinuousEngine, WanSlotStepper
from .router import BucketRouter, t2i_bucket_of, wan_bucket_of
from .t2i_slots import FluxSlotStepper
from .server import (
    BatchingEngine,
    InferenceServer,
    Request,
    sdxl_generate_fn,
    t2i_generate_fn,
)

__all__ = ["BatchingEngine", "BucketRouter", "ContinuousEngine",
           "FluxSlotStepper", "InferenceServer", "Request",
           "WanSlotStepper", "sdxl_generate_fn", "t2i_bucket_of",
           "t2i_generate_fn", "wan_bucket_of"]
