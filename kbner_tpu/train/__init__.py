from .optim import (
    inverse_sqrt_schedule,
    linear_warmup_linear_decay,
    make_finetune_optimizer,
)
from .parser_trainer import (
    BiaffineNERTrainer,
    ClassificationTrainer,
    ParserTrainer,
    RegressionTrainer,
    SemDepTrainer,
)
from .trainer import FinetuneTrainer, TrainConfig

__all__ = [
    "FinetuneTrainer",
    "TrainConfig",
    "make_finetune_optimizer",
    "linear_warmup_linear_decay",
    "inverse_sqrt_schedule",
    "ParserTrainer",
    "SemDepTrainer",
    "BiaffineNERTrainer",
    "ClassificationTrainer",
    "RegressionTrainer",
]
