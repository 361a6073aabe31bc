from .cross_scan import cross_merge, cross_scan
from .linear_recurrence import linear_recurrence
from .scan_api import default_impl, selective_scan
from .selective_scan_ref import (
    linear_recurrence_ref,
    selective_scan_ref,
    selective_scan_seq,
)

__all__ = [
    "cross_scan",
    "cross_merge",
    "linear_recurrence",
    "linear_recurrence_ref",
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_seq",
    "default_impl",
]
