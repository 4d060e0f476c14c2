"""E6: event-stream processing (SURVEY.md §2.11-2.12).

Batch-first kernels in ``windows`` (same DataFrame ops the oracle can
check) and Structured Streaming wrappers in ``streams`` (readStream +
watermark + the identical windowed aggregations).
"""
