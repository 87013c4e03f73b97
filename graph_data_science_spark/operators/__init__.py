"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing (all DataFrame-native; Python only in
Arrow-batched mapInPandas stages)."""
