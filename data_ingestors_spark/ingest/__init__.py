from data_ingestors_spark.ingest.summary import IngestionSummary  # noqa: F401
from data_ingestors_spark.ingest.config import ResolvedConfig, STANDARD_COLUMNS, RESERVED_COLUMNS  # noqa: F401
from data_ingestors_spark.ingest.pipeline import Ingestor  # noqa: F401
