"""Raster/dataflow operators (SURVEY.md §2.3) as DataFrame transforms."""
