from . import relational, relational2, relational3, relational4

__all__ = ["relational", "relational2", "relational3", "relational4"]
