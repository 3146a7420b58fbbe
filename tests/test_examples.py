"""Every shipped example YAML must pass jsonschema validation — the
user-facing analog of the reference's per-category templates. These
are validated, not executed (their source paths are placeholders)."""

from __future__ import annotations

import glob
import os

import pytest

from data_ingestors_spark.cli.frontend import load_ingest_yaml, validate_config
from data_ingestors_spark.cli.schema import CATEGORIES

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.yaml")))


def test_examples_exist_for_every_category():
    names = {os.path.splitext(os.path.basename(p))[0] for p in EXAMPLES}
    # every category has its example; feature-showcase examples
    # (e.g. custom_processor) may exist beyond the category set
    assert set(CATEGORIES) <= names


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_validates(path):
    raw = load_ingest_yaml(path)
    validate_config(raw)  # raises IngestConfigError on any violation
    base = os.path.splitext(os.path.basename(path))[0]
    if base in CATEGORIES:
        assert raw["category"] == base
    else:
        assert raw["category"] in CATEGORIES
