# data-ingestors-spark runtime image.
#
# Mirrors the reference's deployment shape (/root/reference/Dockerfile:
# python base + package install + console entry point) re-based on a
# Spark-enabled image so the same container runs driver or executor.
#
# Build:  docker build -t data-ingestors-spark:0.4.0 .
# Run:    docker run -e INGEST_CONFIG=/conf/ingest.yaml \
#             -v $PWD/conf:/conf data-ingestors-spark:0.4.0
# On k8s: see deploy/ingest-job.yaml (spark-submit against the
#         Spark-on-K8s operator or a standalone master).

FROM apache/spark:4.0.0-python3

USER root
WORKDIR /app

# package sources + metadata only; tests/testdata stay out of the image
COPY pyproject.toml README.md ./
COPY data_ingestors_spark ./data_ingestors_spark

RUN pip install --no-cache-dir .

# non-root runtime (the base image ships user `spark`)
USER spark

# the console script reads INGEST_CONFIG when no argv path is given
ENTRYPOINT ["spark-ingest"]
