"""X -> Ray Dataset readers (the reference's *ToIon task family, SURVEY.md §2.1)."""
