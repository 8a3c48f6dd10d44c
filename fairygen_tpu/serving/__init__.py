from .server import BatchingEngine, InferenceServer, Request

__all__ = ["BatchingEngine", "InferenceServer", "Request"]
