from data_ingestors_spark.api.client import (
    ApiSink,
    HttpApiSink,
    MockApiSink,
    register_dataset,
    send_metadata_batches,
)

__all__ = [
    "ApiSink",
    "HttpApiSink",
    "MockApiSink",
    "register_dataset",
    "send_metadata_batches",
]
