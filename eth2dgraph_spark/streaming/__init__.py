from .live import backfill_then_live, process_block_batch, start_block_stream

__all__ = ["backfill_then_live", "process_block_batch", "start_block_stream"]
