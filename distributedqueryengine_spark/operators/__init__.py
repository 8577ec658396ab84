"""Operator library: relational core, aggregates, windows, as-of/range joins."""
