"""Click CLIs matching the reference's command shapes (SURVEY.md §2.8)."""
