"""Registries backing the Context API.

The reference wraps every table in a DataContainer/ColumnContainer pair to
track SQL-name→backend-name column mappings (datacontainer.py:14-231). Spark
tracks logical column identity inside Catalyst, so no wrapper is needed —
what remains is the *schema namespace* object (reference SchemaContainer,
datacontainer.py:281-291): a named registry of tables, functions, models,
experiments and statistics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class Statistics:
    """Table statistics; row count only, mirroring the reference
    (datacontainer.py:174-188). Spark CBO stats are richer — this object is
    only the user-facing API carrier."""

    row_count: float | None = None


@dataclass
class Aggregation:
    """A custom aggregation, tri-phase like the reference's
    ``dask.dataframe.Aggregation`` (registered at context.py:415-480):

    - ``chunk``: applied per partition (pandas Series → scalar)
    - ``agg``: combines chunk results (pandas Series of chunk outputs → scalar)
    - ``finalize``: optional final transform (scalar → scalar)

    Spark note: PySpark's GROUPED_AGG pandas UDF offers no partial/merge
    hook, so when this is registered we execute chunk over the whole group's
    series and then agg over the single result — semantically equivalent for
    any decomposable aggregation, but without tree reduction. At 100 TB a
    Scala ``Aggregator`` would be the fast path; the groupBy shuffle still
    distributes by key, so per-group work is bounded by group size.
    """

    name: str
    chunk: Callable
    agg: Callable
    finalize: Callable | None = None

    def as_series_fn(self) -> Callable:
        """Collapse the tri-phase spec into a single pandas Series→scalar."""
        import pandas as pd

        chunk, agg, finalize = self.chunk, self.agg, self.finalize

        def fn(s):
            chunked = chunk(s)
            combined = agg(pd.Series([chunked]))
            return finalize(combined) if finalize is not None else combined

        return fn


@dataclass
class UDFInfo:
    name: str
    func: Callable
    parameters: list[tuple[str, Any]]
    return_type: Any
    row_udf: bool = False
    aggregation: bool = False


@dataclass
class SchemaContainer:
    """One SQL schema namespace (reference datacontainer.py:281-291)."""

    name: str
    tables: dict[str, Any] = field(default_factory=dict)  # name -> DataFrame
    statistics: dict[str, Statistics] = field(default_factory=dict)
    functions: dict[str, UDFInfo] = field(default_factory=dict)
    models: dict[str, tuple[Any, list[str]]] = field(default_factory=dict)
    experiments: dict[str, Any] = field(default_factory=dict)
    filepaths: dict[str, str] = field(default_factory=dict)
    # resolved source format per file-backed table (parquet/csv/json/orc…)
    # so maintenance ops (OPTIMIZE) rewrite in the table's real format
    fileformats: dict[str, str] = field(default_factory=dict)
    # locations superseded by OPTIMIZE's swap-on-publish, awaiting VACUUM
    stale_locations: dict[str, list[str]] = field(default_factory=dict)
