"""Structured Streaming front-end: optional incremental ingestion over
the same batch kernels (SURVEY §2.9 — batch+resume is the core model;
this is the additive continuous-arrival path)."""
