"""Custom DataFrame -> DataFrame operators (batch/stream pure transforms)."""
