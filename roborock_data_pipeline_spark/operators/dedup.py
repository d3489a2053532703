"""Stub — filled in by later milestone."""
