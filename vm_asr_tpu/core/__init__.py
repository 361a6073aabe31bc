from .checkpoint import CheckpointManager
from .config import CfgNode, default_config, get_config, load_config, update_config
from .logging import create_logger
from .profiling import (
    assert_finite,
    benchmark,
    count_params,
    flops_selective_scan,
    model_flops,
    tree_check_finite,
    xla_cost_analysis,
)
from .tracker import MetricTracker
from .visualization import TensorboardWriter

__all__ = [
    "CheckpointManager",
    "TensorboardWriter",
    "assert_finite",
    "benchmark",
    "count_params",
    "flops_selective_scan",
    "model_flops",
    "tree_check_finite",
    "xla_cost_analysis",
    "CfgNode",
    "default_config",
    "get_config",
    "load_config",
    "update_config",
    "create_logger",
    "MetricTracker",
]
