"""Structured Streaming surface (beyond-reference — SURVEY §2.10 notes the
reference is pure batch; a streaming replay of the event table is the
natural extension)."""
