"""Operators — relational helpers plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal)."""
