"""Running metric aggregation (reference: utils/utils.py:39-79 MetricTracker)."""

from __future__ import annotations

from typing import Dict, Iterable


class MetricTracker:
    """Keeps total / count / average per metric key.

    The reference backs this with a pandas DataFrame; plain dicts do the same
    job with no dependency and O(1) updates.
    """

    def __init__(self, *keys: str, writer=None):
        self.writer = writer
        self._totals: Dict[str, float] = {k: 0.0 for k in keys}
        self._counts: Dict[str, int] = {k: 0 for k in keys}

    def reset(self) -> None:
        for k in self._totals:
            self._totals[k] = 0.0
            self._counts[k] = 0

    def update(self, key: str, value: float, n: int = 1) -> None:
        if key not in self._totals:
            self._totals[key] = 0.0
            self._counts[key] = 0
        if self.writer is not None:
            self.writer.add_scalar(key, value)
        self._totals[key] += float(value) * n
        self._counts[key] += n

    def avg(self, key: str) -> float:
        n = self._counts.get(key, 0)
        return self._totals.get(key, 0.0) / n if n else 0.0

    def result(self) -> Dict[str, float]:
        return {k: self.avg(k) for k in self._totals}

    def get_keys(self) -> Iterable[str]:
        return list(self._totals.keys())
