"""placeholder — filled in build order (SURVEY.md §7.2)."""
