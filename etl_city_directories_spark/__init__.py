"""PySpark-native analytics/ETL engine with the capabilities of
nypl-spacetime/etl-city-directories, rebuilt Spark-first.

Reference semantics: /root/reference/city-directories.js (steps
download/parse/geocode/transform) and entry-parser.js. Architecture is
NOT a port — everything is declarative DataFrame/SQL so Catalyst picks
the physical plan; Python appears only where the JVM genuinely cannot
express the op (hOCR XML parsing, multimodal decode, custom stateful
streaming).
"""

from etl_city_directories_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
