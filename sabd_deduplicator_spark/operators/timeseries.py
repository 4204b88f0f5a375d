"""Events time/JSON queries (SURVEY.md §2.B extensions): filled in Phase 4."""
