"""Sinks: parquet (zstd, versioned+latest, single-file), JSON-array, CSV."""
