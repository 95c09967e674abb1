from .api import ServeContext

__all__ = ["ServeContext"]
