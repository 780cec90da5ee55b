"""Parameter blocks: pydantic validation + ``@``-reference resolution.

Mirrors the reference's config layer semantics (driver-side pure Python):

* nested parameter tree validated by pydantic with user-extensible
  blocks (reference src/cosmap/config/analysis.py:41-139, ``extra =
  "allow"``);
* string values of the form ``"@Block.path.to.value"`` resolve against
  the config tree before validation (reference
  src/cosmap/config/block.py:37-69);
* sky quantities normalize AT INGEST to canonical degrees — a
  ``{"value": v, "units": "arcmin"}`` JSON becomes a plain float in
  degrees (reference validates into astropy Quantity,
  src/cosmap/config/models/sky.py:10-41; we reject executor-side unit
  objects by design, SURVEY.md §4.3.2).
"""

from __future__ import annotations

from typing import Any

from pydantic import BaseModel, ConfigDict, Field, field_validator

from cosmap_spark.pipeline.errors import DagValidationError

#: conversion factors to degrees for angle-unit normalization
_TO_DEG = {
    "deg": 1.0, "degree": 1.0, "degrees": 1.0,
    "arcmin": 1.0 / 60.0, "arcminute": 1.0 / 60.0,
    "arcsec": 1.0 / 3600.0, "arcsecond": 1.0 / 3600.0,
    "rad": 57.29577951308232, "radian": 57.29577951308232,
}


def quantity_to_deg(q: Any) -> float:
    """Normalize a quantity spec to degrees.

    Accepts a bare number (assumed degrees) or ``{"value": v, "units":
    u}`` (reference README.md:155-163 JSON form)."""
    if isinstance(q, (int, float)):
        return float(q)
    if isinstance(q, dict) and "value" in q:
        unit = str(q.get("units", "deg")).lower()
        if unit not in _TO_DEG:
            raise ValueError(f"unknown angular unit {unit!r}")
        return float(q["value"]) * _TO_DEG[unit]
    raise ValueError(f"cannot interpret quantity {q!r}")


# --- @-reference resolution ----------------------------------------------


def _lookup(tree: dict, dotted: str) -> Any:
    cur: Any = tree
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            raise DagValidationError(f"unresolvable config reference @{dotted}")
        cur = cur[part]
    return cur


def resolve_references(tree: dict) -> dict:
    """Replace every ``"@a.b.c"`` string value with the referenced value
    (reference find_ref_values/resolve_references,
    src/cosmap/config/block.py:37-69).  Chained references resolve
    transitively; reference cycles raise."""

    def resolve_value(v: Any, seen: tuple[str, ...]) -> Any:
        if isinstance(v, str) and v.startswith("@"):
            path = v[1:]
            if path in seen:
                raise DagValidationError(f"reference cycle at @{path}")
            return resolve_value(_lookup(tree, path), seen + (path,))
        if isinstance(v, dict):
            return {k: resolve_value(x, seen) for k, x in v.items()}
        if isinstance(v, list):
            return [resolve_value(x, seen) for x in v]
        return v

    return {k: resolve_value(v, ()) for k, v in tree.items()}


# --- parameter models -----------------------------------------------------


class SamplingParameters(BaseModel):
    """Reference src/cosmap/config/analysis.py:57-94 (CosmapSamplingParameters)."""

    model_config = ConfigDict(extra="allow")

    sample_type: str = "Random"
    sample_shape: str = "Circle"
    #: circle radius, degrees (normalized from any angular unit)
    sample_dimensions: float = 1.0
    n_samples: int = Field(default=1000, ge=1)
    ra_bounds: tuple[float, float] = (0.0, 360.0)
    dec_bounds: tuple[float, float] = (-90.0, 90.0)
    seed: int = 42

    @field_validator("sample_dimensions", mode="before")
    @classmethod
    def _norm_dims(cls, v: Any) -> float:
        return quantity_to_deg(v)


class DatasetParameters(BaseModel):
    """Reference src/cosmap/config/analysis.py:96-111."""

    model_config = ConfigDict(extra="allow")

    path: str = ""
    table: str = "catalog"
    columns: list[str] | None = None  # O3: projection pushed to the scan


class OutputParameters(BaseModel):
    """Reference src/cosmap/config/analysis.py:114-118."""

    model_config = ConfigDict(extra="allow")

    path: str = ""
    format: str = "parquet"
    mode: str = "append"


class AnalysisConfig(BaseModel):
    """Top-level block (reference ``Main``,
    src/cosmap/config/analysis.py:121-139)."""

    model_config = ConfigDict(extra="allow")

    name: str = "analysis"
    threads: int = Field(default=1, ge=1)
    sampling_parameters: SamplingParameters = SamplingParameters()
    dataset_parameters: DatasetParameters = DatasetParameters()
    output_parameters: OutputParameters = OutputParameters()
    analysis_parameters: dict[str, Any] = {}


def load_config(raw: dict) -> AnalysisConfig:
    """Resolve @refs then validate (reference create_analysis_block,
    src/cosmap/config/block.py:10-34)."""
    return AnalysisConfig.model_validate(resolve_references(raw))


def combine_run_config(analysis_params: dict, run_config: dict) -> dict:
    """Merge a run config over the analysis' parameters.json (reference
    src/cosmap/api/cmds.py:45 + utils.py:12-52): right-biased deep merge,
    dropping the run-file-only keys."""
    from cosmap_spark.pipeline.manage import combine_dicts

    overlay = {
        k: v for k, v in run_config.items()
        if k not in ("base-analysis", "analysis-mod")
    }
    return combine_dicts(analysis_params, overlay)
