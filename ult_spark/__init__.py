"""ult_spark — PySpark-native geospatial aggregation engine (see SURVEY.md)."""

__version__ = "0.1.0"
