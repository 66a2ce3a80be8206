"""cube_builder_spark — a PySpark-native data-cube / analytics engine.

A from-scratch re-expression of the capabilities of
``brazil-data-cube/cube-builder`` (reference at ``/root/reference``, a
Flask + Celery + rasterio/numpy ETL pipeline) as an idiomatic Apache
Spark DataFrame engine:

- catalog plane (collections/bands/tiles/periods/items) = DataFrames
  (reference: SQLAlchemy/PostGIS, ``cube_builder/controller.py``);
- raster plane = partitioned rows keyed by (tile_id, date, band, pixel
  or block) reduced with window/group aggregations
  (reference: rasterio block windows, ``cube_builder/utils/processing.py``);
- temporal compositing (LCF best-pixel, MED median), observation
  statistics, mask classification, band expressions = Catalyst column
  expressions + ``applyInPandas`` for the block/array path;
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis) that the 100 TB target needs.
"""

__version__ = "0.1.0"
