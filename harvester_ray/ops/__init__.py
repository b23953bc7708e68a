"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing — all map_batches-first over Arrow."""
