from . import blocks, traces, transfers, abi, similarity, lifetimes

__all__ = ["blocks", "traces", "transfers", "abi", "similarity", "lifetimes"]
