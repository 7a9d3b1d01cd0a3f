"""Logging, timing and small host utilities."""
