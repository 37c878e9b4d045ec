"""Operator modules; importing this package registers every harness query.

Module map (SURVEY.md §2 categories):
- ``flagship``            — end-to-end anomaly slice (§7 step 1)
- ``relational``          — joins/aggs/sorts/sets addendum (§2.3/2.4/2.6/2.7)
- ``relational_extra``    — correlated subqueries, grouping sets/cube, unpivot, null ops
- ``timeseries_filters``  — O9–O14 time-range / DSL / buffer / gate
- ``timeseries_aggs``     — O18–O21 resample & stats & quantile thresholds
- ``alignment``           — O15–O17 multi-tag alignment / as-of ffill
- ``windows``             — O22–O25 + rank/lag/range-frame addendum
- ``scalars``             — O28–O32 scalar function surface
- ``streaming_batch``     — O33–O37 batch-expressible streaming analogs
- ``model_sql``           — SQL-expressible faces of the model plane (O40/O44–O46)
- ``providers``           — O1–O5 scan/provider surface + partition pruning
- ``dataset_api``         — public-API entries (TimeSeriesDataset/ModelBuilder/client)
- ``extensions_corpus``   — corpus lifecycle: incremental dedup, snapshot diff, LM-OOV filter, heavy hitters
- ``extensions_dedup``    — E1/E2 + SimHash/Jaccard/components dedup family
- ``extensions_similarity`` — E3/E6 vector search (brute-force + IVF) & centroids
- ``extensions_text``     — E4 text analysis (lang-id, quality, tokens, fingerprints)
- ``extensions_multimodal`` — E5 + binary-column decode plumbing
- ``ml_islands``          — O38–O45 pandas-UDF model islands + MLlib face (rows-only)
"""

from gordo_components_spark.operators import (  # noqa: F401
    alignment,
    dataset_api,
    extensions_corpus,
    extensions_dedup,
    extensions_multimodal,
    extensions_pipeline,
    extensions_similarity,
    extensions_text,
    flagship,
    ml_islands,
    model_sql,
    providers,
    relational,
    relational_extra,
    scalars,
    streaming_batch,
    timeseries_aggs,
    timeseries_filters,
    tpch,
    windows,
)
