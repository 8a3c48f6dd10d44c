from .server import (
    BatchingEngine,
    InferenceServer,
    Request,
    sdxl_generate_fn,
    t2i_generate_fn,
)

__all__ = ["BatchingEngine", "InferenceServer", "Request",
           "sdxl_generate_fn", "t2i_generate_fn"]
