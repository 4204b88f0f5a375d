"""Relational breadth (SURVEY.md §2.B): filled in Phase 3."""
