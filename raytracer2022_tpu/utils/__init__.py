"""Logging, profiling, image IO helpers."""
