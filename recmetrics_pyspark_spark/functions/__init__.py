from . import bpe, curation, text, vectors

__all__ = ["bpe", "curation", "text", "vectors"]
