from .simulator import Simulator, simulate

__all__ = ["Simulator", "simulate"]
