"""Utilities: structured timing, logging, profiling hooks."""
