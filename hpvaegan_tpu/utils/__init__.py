from .logger import LoggingBlock, configure_logging
from .saver import ImageSaver, Saver, VideoSaver, write_video
from .summaries import TensorboardSummary
from .tools import create_progressbar

__all__ = ["LoggingBlock", "configure_logging", "ImageSaver", "Saver",
           "VideoSaver", "write_video", "TensorboardSummary",
           "create_progressbar"]
