from data_ingestors_spark.cli.frontend import load_ingest_yaml, resolve, validate_config

__all__ = ["load_ingest_yaml", "resolve", "validate_config"]
