"""Scalar/vector function helpers (all JVM-side unless noted)."""
