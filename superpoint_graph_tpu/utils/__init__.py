"""Shared utilities: h5 file contracts, padding/bucketing, timing."""
