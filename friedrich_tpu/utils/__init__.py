from .errors import CholeskyError, ConfigError, FriedrichError, ShapeError

__all__ = ["CholeskyError", "ConfigError", "FriedrichError", "ShapeError"]
