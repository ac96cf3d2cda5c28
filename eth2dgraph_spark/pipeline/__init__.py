from . import (
    corpus,
    dedup,
    importance,
    multimodal,
    pack,
    similarity_search,
    sketch,
    split,
    text,
)

__all__ = [
    "corpus",
    "dedup",
    "importance",
    "multimodal",
    "pack",
    "similarity_search",
    "sketch",
    "split",
    "text",
]
