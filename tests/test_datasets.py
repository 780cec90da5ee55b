"""Named-dataset registry tests (heinlein analog, reference
src/cosmap/dataset/plugins.py:20-32): name -> {path, format, columns}
resolution, projection pushdown, and the CLI surface."""

from __future__ import annotations

import pytest

from cosmap_spark.pipeline.errors import CosmapSparkError
from cosmap_spark.sources import datasets


@pytest.fixture()
def registry(tmp_path):
    return tmp_path / "known_datasets.json"


def test_register_resolve_roundtrip(registry):
    datasets.register_dataset(
        "survey", "/root/testdata/sf0.001/customer.parquet",
        columns=["c_custkey", "c_name"], registry=registry,
    )
    entry = datasets.resolve_dataset("survey", registry=registry)
    assert entry == {
        "path": "/root/testdata/sf0.001/customer.parquet",
        "format": "parquet",
        "columns": ["c_custkey", "c_name"],
    }
    with pytest.raises(CosmapSparkError, match="already registered"):
        datasets.register_dataset("survey", "/elsewhere", registry=registry)
    datasets.unregister_dataset("survey", registry=registry)
    with pytest.raises(CosmapSparkError, match="not registered"):
        datasets.resolve_dataset("survey", registry=registry)


def test_open_dataset_by_name_applies_projection(spark, registry):
    datasets.register_dataset(
        "survey", "/root/testdata/sf0.001/customer.parquet",
        columns=["c_custkey", "c_name"], registry=registry,
    )
    df = datasets.open_dataset(spark, "survey", registry=registry)
    assert df.columns == ["c_custkey", "c_name"]
    assert df.count() > 0
    # caller projection narrows further
    df2 = datasets.open_dataset(
        spark, "survey", columns=["c_custkey"], registry=registry
    )
    assert df2.columns == ["c_custkey"]


def test_open_dataset_falls_back_to_path(spark, registry):
    df = datasets.open_dataset(
        spark, "/root/testdata/sf0.001/region.parquet", registry=registry
    )
    assert df.count() == 5


def test_hdf5_dataset_requires_schema(registry):
    with pytest.raises(CosmapSparkError, match="schema"):
        datasets.register_dataset(
            "h5", "/tmp/nope", fmt="hdf5", registry=registry
        )


def test_cli_dataset_commands(registry, monkeypatch, capsys):
    from cosmap_spark.pipeline import cli

    monkeypatch.setattr(datasets, "_DEFAULT_REGISTRY", registry)
    assert cli.main([
        "register-dataset", "survey", "/root/testdata/sf0.001/customer.parquet",
    ]) == 0
    assert cli.main(["datasets"]) == 0
    out = capsys.readouterr().out
    assert "survey" in out and "parquet" in out
    assert cli.main(["unregister-dataset", "survey"]) == 0
    assert datasets.list_datasets(registry=registry) == {}
