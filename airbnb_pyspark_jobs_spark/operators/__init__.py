"""Relational + pipeline operators: SCD2, dims, facts, dedup, similarity."""
