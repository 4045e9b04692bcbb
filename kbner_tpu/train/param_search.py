"""Hyperparameter search (reference ``flair/hyperparameter/
param_selection.py:48-159``): random search over a parameter space, each
trial a short training run, best setting by dev score."""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class SearchSpace:
    """Named choices (lists) or (low, high) uniform/log-uniform ranges."""

    choices: Dict[str, Sequence[Any]] = dataclasses.field(
        default_factory=dict)
    uniform: Dict[str, Tuple[float, float]] = dataclasses.field(
        default_factory=dict)
    log_uniform: Dict[str, Tuple[float, float]] = dataclasses.field(
        default_factory=dict)

    def sample(self, rng: np.random.RandomState) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, vals in self.choices.items():
            out[k] = vals[rng.randint(len(vals))]
        for k, (lo, hi) in self.uniform.items():
            out[k] = float(rng.uniform(lo, hi))
        for k, (lo, hi) in self.log_uniform.items():
            out[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        return out


def random_search(
    space: SearchSpace,
    run_trial: Callable[[Dict[str, Any]], float],
    n_trials: int = 10,
    seed: int = 0,
    base_path: str | Path | None = None,
) -> Dict[str, Any]:
    """Sample settings, run trials, return {best_params, best_score, trials}."""
    rng = np.random.RandomState(seed)
    trials: List[Dict[str, Any]] = []
    best_score, best_params = -np.inf, None
    for i in range(n_trials):
        params = space.sample(rng)
        score = float(run_trial(params))
        trials.append({"params": params, "score": score})
        if score > best_score:
            best_score, best_params = score, params
    result = {"best_params": best_params, "best_score": best_score,
              "trials": trials}
    if base_path is not None:
        Path(base_path).mkdir(parents=True, exist_ok=True)
        (Path(base_path) / "param_search.json").write_text(
            json.dumps(result, indent=2))
    return result
