from tinynn_autograd_tpu.utils.data_iterator import Batch, BaseIterator, BatchIterator
from tinynn_autograd_tpu.utils.downloader import download_url
from tinynn_autograd_tpu.utils.seeder import random_seed
from tinynn_autograd_tpu.utils.timer import Timer
from tinynn_autograd_tpu.utils import debug, profiler

__all__ = [
    "Batch", "BaseIterator", "BatchIterator", "download_url",
    "random_seed", "Timer", "profiler", "debug",
]
