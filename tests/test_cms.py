"""Count-min sketch: one-sided error, merge equality, exactness at
ample width, zero for absent keys, and the geometry guard."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.functions.cms import (
    cms_estimate,
    cms_merge,
    cms_table,
)


def _stream(spark, spec: dict[str, int]):
    rows = [(k,) for k, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, "key string")


def test_overestimate_only_and_exact_when_wide(spark):
    """Estimates never undercount (structural CMS guarantee); with
    width >> distinct keys, collisions vanish and every estimate is
    exact."""
    spec = {f"k{i}": (i % 7) + 1 for i in range(50)}
    stream = _stream(spark, spec)
    keys = spark.createDataFrame([(k,) for k in spec], "key string")

    narrow = cms_table(stream, width=8)
    est_narrow = {
        r["key"]: r["cms_n"]
        for r in cms_estimate(narrow, keys).collect()
    }
    assert all(est_narrow[k] >= n for k, n in spec.items())
    assert any(est_narrow[k] > n for k, n in spec.items())  # collisions real

    wide = cms_table(stream, width=4096)
    est_wide = {
        r["key"]: r["cms_n"]
        for r in cms_estimate(wide, keys).collect()
    }
    assert est_wide == spec


def test_merge_equals_rebuild(spark):
    """cms_merge(sketch(A), sketch(B)) must equal sketch(A ++ B) cell
    for cell — the incremental-maintenance contract."""
    a = _stream(spark, {f"a{i}": i + 1 for i in range(20)})
    b = _stream(spark, {f"a{i}": 2 for i in range(10, 30)})
    combined = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_table(a.unionByName(b)).table.collect()
    }
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_merge(cms_table(a), cms_table(b)).table.collect()
    }
    assert merged == combined and len(merged) > 0
    # mismatched geometries must refuse to merge (summing
    # differently-hashed tables would silently corrupt estimates)
    with pytest.raises(ValueError, match="geometry mismatch"):
        cms_merge(cms_table(a, width=64), cms_table(b, width=128))


def test_absent_key_estimates_zero_or_collision(spark):
    """A key never inserted estimates 0 unless EVERY one of its cells
    collides with inserted keys — at ample width, exactly 0."""
    stream = _stream(spark, {"present": 5})
    probe = spark.createDataFrame([("absent",)], "key string")
    sketch = cms_table(stream, width=4096)
    est = cms_estimate(sketch, probe).collect()[0]["cms_n"]
    assert est == 0


def test_geometry_guard(spark):
    stream = _stream(spark, {"x": 1})
    with pytest.raises(ValueError, match="depth/width"):
        cms_table(stream, depth=0)


def test_heavy_terms_query_against_python_model(spark, sf_dir):
    """The registered query's exact side must equal a Python Counter
    over the same tokenization, and every sketch readout bounds its
    exact count from above."""
    from cdc_2025_spark.io import read_table
    from cdc_2025_spark.queries.analytics import (
        CMS_TOP_K,
        sketch_cms_heavy_terms,
    )

    got = sketch_cms_heavy_terms(spark, sf_dir).collect()
    assert len(got) == CMS_TOP_K
    texts = [
        r["text"]
        for r in read_table(spark, sf_dir, "documents").collect()
    ]
    import re

    counts = Counter(
        t for x in texts for t in re.split(r"\s+", x.strip().lower())
    )
    want_top = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:CMS_TOP_K]
    assert sorted((r["term"], r["exact_n"]) for r in got) == sorted(
        want_top
    )
    assert all(r["cms_n"] >= r["exact_n"] for r in got)


def test_cms_params_textbook_sizing(spark):
    """cms_params follows the Cormode-Muthukrishnan bound: width =
    ceil(e/eps), depth = ceil(ln 1/delta) — and a sketch built at a
    tight budget really does bound the overcount by eps*N on a
    skewed stream (one-sided: never under)."""
    import math

    import pytest

    from cdc_2025_spark.functions.cms import (
        cms_estimate,
        cms_params,
        cms_table,
    )

    assert cms_params(0.01, 0.05) == (3, math.ceil(math.e / 0.01))
    assert cms_params(0.1, 0.5) == (1, 28)
    with pytest.raises(ValueError, match="eps"):
        cms_params(0.0, 0.1)
    with pytest.raises(ValueError, match="delta"):
        cms_params(0.1, 1.0)

    eps, delta = 0.02, 0.01
    depth, width = cms_params(eps, delta)
    rows = [(f"k{i % 40}",) for i in range(900)] + [("hot",)] * 100
    df = spark.createDataFrame(rows, "key string")
    sk = cms_table(df, "key", depth=depth, width=width)
    n = len(rows)
    est = {
        r["key"]: r["cms_n"]
        for r in cms_estimate(
            sk, spark.createDataFrame([("hot",), ("k0",)], "key string")
        ).collect()
    }
    assert est["hot"] >= 100 and est["hot"] <= 100 + eps * n
    assert est["k0"] >= 23 and est["k0"] <= 23 + eps * n
