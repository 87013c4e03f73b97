from graph_data_science_spark.sources.transcripts import (
    TRANSCRIPTS_SCHEMA,
    generate_transcripts,
)
from graph_data_science_spark.sources.edges import derive_edges
from graph_data_science_spark.sources.tables import load_table

__all__ = [
    "TRANSCRIPTS_SCHEMA",
    "generate_transcripts",
    "derive_edges",
    "load_table",
]
