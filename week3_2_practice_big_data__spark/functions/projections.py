"""Placeholder — filled in by build plan SURVEY.md §7."""
