"""Text analysis operators over `documents` (filled in M3)."""
