"""Dataset -> X writers (the reference's IonTo* task family, SURVEY.md §2.2)."""
