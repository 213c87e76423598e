"""Similarity search over `embeddings` (filled in M3)."""
