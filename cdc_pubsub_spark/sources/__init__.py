"""Sources: CDC envelope/path synthesis and streaming ingest."""
