"""Structured Streaming surface (SURVEY.md §2.7).

The reference runs three long-lived poll loops over SQL-Server queue
tables with destructive batch consumption (at-most-once). The rebuild's
primary replacement is checkpointed idempotent batch (checkpoint.py, as
the north rule requires); this package adds the Structured Streaming
variant for genuinely incremental ingest: file-source streams with
``Trigger.AvailableNow`` + ``foreachBatch`` into the same extraction
stage, with Spark's streaming checkpoint giving exactly-once file
tracking — the correct version of the reference's fetch-then-DELETE
discipline.
"""
