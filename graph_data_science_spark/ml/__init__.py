"""ML pipelines + model catalog (reference ``gds.beta.pipeline.*`` and
``gds.model.*`` — SURVEY.md §2.D Embeddings/ML family)."""
