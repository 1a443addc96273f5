"""Spark DataFrame operators: extraction, partitioning, lineage, and the
training-data-pipeline surface (dedup, similarity, text stats)."""
