from . import bpe, curation, evals, text, vectors

__all__ = ["bpe", "curation", "evals", "text", "vectors"]
