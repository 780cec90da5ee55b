"""Plugin hook tests (reference O31 semantics: firstresult, unique,
request-by-name) + TOML config ingestion (O4 suffix dispatch)."""

from __future__ import annotations

import pytest

from cosmap_spark.pipeline import plugins
from cosmap_spark.pipeline.errors import CosmapSparkError


@pytest.fixture(autouse=True)
def clean_hooks():
    yield
    for h in plugins.KNOWN_HOOKS:
        plugins.unregister(h)


def test_unknown_hook_rejected():
    with pytest.raises(CosmapSparkError, match="unknown hook"):
        plugins.register("made_up_hook", lambda: None)


def test_unique_registration():
    plugins.register("generate_samples", lambda spark, sp: "first")
    with pytest.raises(CosmapSparkError, match="already has"):
        plugins.register("generate_samples", lambda spark, sp: "second")
    plugins.register("generate_samples", lambda spark, sp: "forced", replace=True)
    assert plugins.call("generate_samples", None, None) == "forced"


def test_default_fallback():
    assert plugins.call("cone_strategy", 1, 2, default=lambda a, b: a + b) == 3
    with pytest.raises(CosmapSparkError, match="no implementation"):
        plugins.request("generate_tasks")


def test_sampler_hook_overrides_analysis(spark):
    """A registered generate_samples plugin replaces the uniform sampler
    inside Analysis.build (the reference's plugin use-case)."""
    from cosmap_spark.pipeline.analysis import Analysis
    from cosmap_spark.tables import catalog_df

    @plugins.register("generate_samples")
    def fixed_grid(spark_, sampling):
        return spark_.createDataFrame(
            [(0, 137.508, 13.654584745987911, 5.0)],
            "sample_id long, ra double, dec double, radius_deg double",
        )

    analysis = Analysis(
        {"name": "hooked", "sampling_parameters": {"n_samples": 999}},
        {
            "count_objects": {
                "needed-data": ["catalog"],
                "is-output": True,
            }
        },
        {
            "count_objects": lambda catalog: catalog.groupBy("sample_id").count()
        },
    )
    rows = analysis.build(
        spark, catalog_df(spark, "/root/testdata/sf0.001")
    ).collect()
    # one fixed sample centered exactly on object 1's position
    assert len(rows) == 1 and rows[0]["sample_id"] == 0 and rows[0]["count"] >= 1


def test_toml_run_config(tmp_path):
    from cosmap_spark.pipeline.cli import _load_run_config

    f = tmp_path / "run.toml"
    f.write_text('["base-analysis"]\n', encoding="utf-8")
    f.write_text('"base-analysis" = "quickstart"\n[sampling_parameters]\nn_samples = 5\n')
    cfg = _load_run_config(str(f))
    assert cfg["base-analysis"] == "quickstart"
    assert cfg["sampling_parameters"]["n_samples"] == 5
