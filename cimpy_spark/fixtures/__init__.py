from cimpy_spark.fixtures.events_transcripts import (  # noqa: F401
    transcripts_from_events,
    transcripts_sql,
    triples_oracle_sql,
)
