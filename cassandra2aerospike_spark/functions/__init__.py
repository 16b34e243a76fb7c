from . import dedup, similarity, text, tokens

__all__ = ["dedup", "similarity", "text", "tokens"]
