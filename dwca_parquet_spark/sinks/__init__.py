"""Sinks: parquet (zstd, versioned+latest, single-file) and JSON-array."""
