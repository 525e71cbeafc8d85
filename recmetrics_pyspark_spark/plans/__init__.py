from . import relational, relational2

__all__ = ["relational", "relational2"]
