"""Structured Streaming surfaces: watermarked windowed aggregation over
an events stream and incremental index maintenance via foreachBatch."""
