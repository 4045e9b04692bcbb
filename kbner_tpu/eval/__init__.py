from .conlleval import ConllEval, conll_evaluate
from .metrics import Metric, evaluate_spans
from .ensemble import ensemble_predictions

__all__ = ["ConllEval", "conll_evaluate", "Metric", "evaluate_spans",
           "ensemble_predictions"]
