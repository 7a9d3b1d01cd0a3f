"""Segment store and ultrasonication read simulation."""
