from . import blocks, traces, transfers, abi, similarity, lifetimes, extract

__all__ = ["blocks", "traces", "transfers", "abi", "similarity", "lifetimes", "extract"]
