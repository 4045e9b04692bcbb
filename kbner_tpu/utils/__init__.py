from .plotter import plot_training_curves

__all__ = ["plot_training_curves"]
