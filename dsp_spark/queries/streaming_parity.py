"""Batch-parity forms of the reference's streaming pipeline (filled in M1/M4)."""
