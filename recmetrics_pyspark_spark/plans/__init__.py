from . import relational, relational2, relational3

__all__ = ["relational", "relational2", "relational3"]
