"""Plan introspection (SURVEY.md §4): assert the physical properties that
matter at 100 TB — filters pushed to the scan, dims broadcast, shuffles
bounded, Python out of the hot path."""
