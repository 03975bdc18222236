"""Physical-plan inspection: the engine's scale-correctness evidence."""
