from .engine import SearchEngine
from .server import create_server, serve

__all__ = ["SearchEngine", "create_server", "serve"]
