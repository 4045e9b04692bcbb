from .metrics import Metric, evaluate_spans
from .ensemble import ensemble_predictions

__all__ = ["Metric", "evaluate_spans", "ensemble_predictions"]
