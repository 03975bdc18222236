"""Structured Streaming operators and the file-stream test harness."""
