"""Training-data-pipeline operators: text analysis, dedup, similarity search."""
