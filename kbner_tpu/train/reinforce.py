"""ACE: automated concatenation of embeddings via reinforcement learning.

TPU-native counterpart of the reference's ``EmbedController``
(``/root/reference/flair/models/controller.py:17-113``) and
``ReinforcementTrainer`` (``/root/reference/flair/trainers/
reinforcement_trainer.py:273+``):

  - the controller keeps a Bernoulli logit per stack member; ``sample``
    draws a selection mask, avoiding the all-zero mask and previously
    visited masks (``controller.py:85-102``),
  - each episode: sample a mask -> fine-tune the stacked tagger briefly with
    that mask -> dev F1 is the reward -> REINFORCE update of the logits
    (reward variants log/sqrt/discounted, ``reinforcement_trainer.py:
    314-321``),
  - the best action is stored in ``training_state.json`` and restored at
    parse time (``train.py:213-253``).

The controller itself is tiny host-side math (a handful of logits); the
device work is the inner fine-tuning, which reuses FinetuneTrainer.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable, List, Optional, Set, Tuple

import numpy as np


@dataclasses.dataclass
class EmbedController:
    """Bernoulli selector over N stack members."""

    num_embeddings: int
    logits: Optional[np.ndarray] = None
    baseline: float = 0.0

    def __post_init__(self):
        if self.logits is None:
            self.logits = np.zeros(self.num_embeddings, dtype=np.float64)

    def probs(self) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.logits))

    def sample(self, rng: np.random.RandomState,
               visited: Set[Tuple[int, ...]]) -> np.ndarray:
        """Draw a non-empty, not-yet-visited mask (controller.py:85-102)."""
        p = self.probs()
        for _ in range(64):
            mask = (rng.rand(self.num_embeddings) < p).astype(np.float32)
            key = tuple(int(x) for x in mask)
            if mask.sum() > 0 and key not in visited:
                return mask
        # fall back: flip the least-probable unvisited bit pattern
        mask = (p >= 0.5).astype(np.float32)
        if mask.sum() == 0:
            mask[int(np.argmax(p))] = 1.0
        return mask

    def best_action(self) -> np.ndarray:
        mask = (self.probs() >= 0.5).astype(np.float32)
        if mask.sum() == 0:
            mask[int(np.argmax(self.probs()))] = 1.0
        return mask

    def update(self, mask: np.ndarray, reward: float, lr: float = 0.1,
               baseline_decay: float = 0.9) -> None:
        """REINFORCE: grad log p(mask) * (reward - baseline)."""
        advantage = reward - self.baseline
        p = self.probs()
        grad = (mask - p) * advantage  # d log Bernoulli / d logits
        self.logits = self.logits + lr * grad
        self.baseline = (baseline_decay * self.baseline
                         + (1 - baseline_decay) * reward)

    # -- persistence ----------------------------------------------------------

    def save(self, path: str | Path, episode: int,
             best_action: Optional[np.ndarray] = None) -> None:
        Path(path).write_text(json.dumps({
            "episode": episode,
            "logits": self.logits.tolist(),
            "baseline": self.baseline,
            "best_action": (best_action if best_action is not None
                            else self.best_action()).tolist(),
        }))

    @classmethod
    def load(cls, path: str | Path) -> Tuple["EmbedController", dict]:
        state = json.loads(Path(path).read_text())
        c = cls(num_embeddings=len(state["logits"]),
                logits=np.asarray(state["logits"]),
                baseline=state["baseline"])
        return c, state


@dataclasses.dataclass
class ReinforceConfig:
    episodes: int = 10
    controller_lr: float = 0.1
    reward_kind: str = "plain"  # plain | log | sqrt
    seed: int = 0


class ReinforcementTrainer:
    """ACE episode loop over a StackedSequenceTagger.

    ``run_episode(mask) -> dev_f1`` is injected: it should fine-tune the
    tagger with ``batch['selection'] = mask`` for a few epochs and return
    dev F1 (our FinetuneTrainer with a selection-injecting batch hook).
    """

    def __init__(self, num_embeddings: int, run_episode: Callable,
                 config: ReinforceConfig):
        self.controller = EmbedController(num_embeddings)
        self.run_episode = run_episode
        self.config = config
        self.history: List[dict] = []

    def _shape_reward(self, f1: float, prev_best: float) -> float:
        gain = f1 - prev_best
        kind = self.config.reward_kind
        if kind == "log":
            return float(np.sign(gain) * np.log1p(abs(gain) * 100))
        if kind == "sqrt":
            return float(np.sign(gain) * np.sqrt(abs(gain)))
        return gain

    def train(self, base_path: str | Path) -> dict:
        base_path = Path(base_path)
        base_path.mkdir(parents=True, exist_ok=True)
        rng = np.random.RandomState(self.config.seed)
        visited: Set[Tuple[int, ...]] = set()
        best_f1, best_mask = -1.0, None

        for episode in range(self.config.episodes):
            mask = self.controller.sample(rng, visited)
            visited.add(tuple(int(x) for x in mask))
            f1 = float(self.run_episode(mask))
            reward = self._shape_reward(f1, best_f1 if best_f1 >= 0 else 0.0)
            self.controller.update(mask, reward,
                                   lr=self.config.controller_lr)
            if f1 > best_f1:
                best_f1, best_mask = f1, mask
            self.history.append({
                "episode": episode, "mask": mask.tolist(), "f1": f1,
                "reward": reward,
            })
            self.controller.save(
                base_path / "training_state.json", episode, best_mask)
        return {"best_f1": best_f1, "best_action": best_mask.tolist(),
                "history": self.history}


def ace_train(
    trainer,
    train_config,
    base_path: str | Path,
    num_embeddings: int,
    config: Optional[ReinforceConfig] = None,
) -> dict:
    """Full ACE driver over a StackedSequenceTagger + FinetuneTrainer.

    Each episode restarts from the initial params, fine-tunes with the
    sampled selection mask, and reports dev F1 as reward; after the search,
    the final model is trained with the best action and saved under
    ``base_path`` (mirroring the reference's episode -> best_action -> final
    training flow, reinforcement_trainer.py:273+, train.py:213-253).
    """
    import jax as _jax

    base_path = Path(base_path)
    config = config or ReinforceConfig()
    init_params = _jax.tree_util.tree_map(lambda x: x.copy(), trainer.params)

    def run_episode(mask: np.ndarray) -> float:
        trainer.params = _jax.tree_util.tree_map(
            lambda x: x.copy(), init_params)
        trainer.selection = mask
        result = trainer.train(base_path / "episode", train_config)
        return result["best_dev_score"]

    rt = ReinforcementTrainer(num_embeddings, run_episode, config)
    search = rt.train(base_path)

    # final training with the best action
    trainer.params = _jax.tree_util.tree_map(lambda x: x.copy(), init_params)
    trainer.selection = np.asarray(search["best_action"], np.float32)
    final = trainer.train(base_path, train_config)
    search["final"] = final
    return search
