from . import curation, text, vectors

__all__ = ["curation", "text", "vectors"]
