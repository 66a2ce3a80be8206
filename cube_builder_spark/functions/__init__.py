"""Training-data-pipeline operator library (dedup, similarity, text)."""
