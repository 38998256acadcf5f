"""Sources: Darwin Core Archive reader + harvest adapters."""
