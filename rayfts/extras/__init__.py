"""Training-data pipeline operators beyond the reference's surface:
deduplication, similarity search, text analysis, multimodal plumbing.

These are first-class engine components for the 100 TB use case (driver
brief): each has a `queries()` entry in __ray_entry__.py, with a DuckDB
oracle where SQL can express the semantics.
"""
