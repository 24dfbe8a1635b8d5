from change3d_tpu.data.transforms import TransformPipeline, make_transform_pipelines
from change3d_tpu.data.datasets import (
    BCDDataset,
    SCDDataset,
    BDADataset,
    CaptionDataset,
)
from change3d_tpu.data.pipeline import DataLoader, shard_batch

__all__ = [
    "TransformPipeline",
    "make_transform_pipelines",
    "BCDDataset",
    "SCDDataset",
    "BDADataset",
    "CaptionDataset",
    "DataLoader",
    "shard_batch",
]
