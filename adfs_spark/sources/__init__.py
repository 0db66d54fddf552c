"""Source/sink connectors with schema enforcement."""
