from . import dedup, similarity_search, text, multimodal

__all__ = ["dedup", "similarity_search", "text", "multimodal"]
