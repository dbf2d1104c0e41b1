"""Sources and sinks: the deterministic mock web, image-table storage."""
