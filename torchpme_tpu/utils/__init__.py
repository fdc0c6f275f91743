from .validation import validate_parameters

__all__ = ["validate_parameters"]
