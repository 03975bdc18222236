"""Relational operators: scans, filters, joins, aggregates, windows, sorts, set ops."""
