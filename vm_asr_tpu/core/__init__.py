from .config import CfgNode, default_config, get_config, load_config, update_config
from .logging import create_logger
from .tracker import MetricTracker

__all__ = [
    "CfgNode",
    "default_config",
    "get_config",
    "load_config",
    "update_config",
    "create_logger",
    "MetricTracker",
]
