"""Source-side operators: scene-id parsing, local directory scans,
raster reader stubs (SURVEY §2.1)."""
