from .device_cache import DeviceCacheLoader, supports_device_cache
from .image import MultipleImageDataset, SingleImageDataset
from .loader import BatchLoader
from .video import SingleVideoDataset, video_to_frames

__all__ = ["SingleImageDataset", "MultipleImageDataset", "BatchLoader",
           "DeviceCacheLoader", "supports_device_cache",
           "SingleVideoDataset", "video_to_frames"]
