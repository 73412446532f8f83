"""Host input pipeline: annotations, tokenization, images, device loading."""

from mgnns_tpu.data.text import TextCorpus
from mgnns_tpu.data.dataset import TumblrDataset, load_constants
from mgnns_tpu.data.loader import DeviceLoader

__all__ = ["TextCorpus", "TumblrDataset", "load_constants", "DeviceLoader"]
