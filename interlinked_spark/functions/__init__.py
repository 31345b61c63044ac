from .registry import FUNCTIONS, get_function, register_function

__all__ = ["FUNCTIONS", "get_function", "register_function"]
