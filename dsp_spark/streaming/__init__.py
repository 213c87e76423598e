"""Structured Streaming layer: metrics, stateful operators, windows."""
