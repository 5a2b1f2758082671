"""Every registered query with an oracle must match DuckDB exactly —
this mirrors the driver's correctness gate (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from adt_spark.queries import load_all
from adt_spark.testing import check_query

ALL = sorted(load_all())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    rows = check_query(spark, sf_dir, name)
    q = load_all()[name]
    if q.oracle is None:
        assert rows >= 0
