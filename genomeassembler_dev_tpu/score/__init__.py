"""Breakage-probability scoring of assembled solutions."""
