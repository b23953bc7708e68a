"""Inverted-index subsystem: codec, segment build, manifest, BM25 query."""
