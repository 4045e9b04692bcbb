from .metrics import Metric, evaluate_spans

__all__ = ["Metric", "evaluate_spans"]
