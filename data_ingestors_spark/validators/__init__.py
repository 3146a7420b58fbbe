from data_ingestors_spark.validators.base import ValidationResult  # noqa: F401
from data_ingestors_spark.validators.rules import (  # noqa: F401
    validate_schema_single_pass,
    column_rule_aggs,
    time_series_aggs,
)
