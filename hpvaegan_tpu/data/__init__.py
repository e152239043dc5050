from .image import MultipleImageDataset, SingleImageDataset
from .loader import BatchLoader
from .video import SingleVideoDataset, video_to_frames

__all__ = ["SingleImageDataset", "MultipleImageDataset", "BatchLoader",
           "SingleVideoDataset", "video_to_frames"]
