"""Deduplication operators over `documents` (filled in M3)."""
