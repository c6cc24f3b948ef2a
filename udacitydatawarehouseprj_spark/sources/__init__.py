"""Sources and sinks — ingestion (S1/S2) and layout-aware writing (S3-S5)."""
