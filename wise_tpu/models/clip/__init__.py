from .extractor import OpenClipExtractor
from .model import CLIP, CLIPConfig, get_clip_config
from .preprocess import preprocess_images
from .tokenizer import get_tokenizer

__all__ = [
    "OpenClipExtractor",
    "CLIP",
    "CLIPConfig",
    "get_clip_config",
    "preprocess_images",
    "get_tokenizer",
]
