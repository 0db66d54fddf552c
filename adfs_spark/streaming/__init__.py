"""Structured Streaming veneer for the reference's control loops."""
