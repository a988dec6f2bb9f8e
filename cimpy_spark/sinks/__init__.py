"""Sinks: serialization of engine results back to external formats
(the export half of the reference's import/export pair)."""
