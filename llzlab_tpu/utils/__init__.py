"""Config, logging, profiling, checkpoint utilities (SURVEY.md §5)."""
