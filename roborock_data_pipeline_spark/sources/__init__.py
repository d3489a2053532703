from roborock_data_pipeline_spark.sources.tables import TABLE_NAMES, load, load_all

__all__ = ["TABLE_NAMES", "load", "load_all"]
