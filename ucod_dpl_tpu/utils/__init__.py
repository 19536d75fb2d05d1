from .logger import Logger, get_logger
from .seed import set_random_seed

__all__ = ["Logger", "get_logger", "set_random_seed"]
