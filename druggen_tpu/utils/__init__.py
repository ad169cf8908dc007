"""Utilities: structured logging, profiling, sample artifacts."""
