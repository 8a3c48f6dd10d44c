from .operators import (
    DataProcessingOperator,
    DataProcessingPipeline,
    ToAbsolutePath,
    LoadImage,
    LoadVideo,
    LoadGIF,
    LoadNpz,
    ImageCropAndResize,
    RouteByType,
    RouteByExtensionName,
    SequencialProcess,
    ToList,
    ToInt,
    ToFloat,
    ToStr,
)
from .unified_dataset import UnifiedDataset
