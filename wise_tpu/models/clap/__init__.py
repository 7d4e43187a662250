from .extractor import ClapExtractor
from .model import CLAP, CLAPConfig, get_clap_config

__all__ = ["ClapExtractor", "CLAP", "CLAPConfig", "get_clap_config"]
