"""emb_covariance's mapInArrow fast path (100 TB configuration).

The exact explode path stays the oracle-verified default; setting
``ADT_COV_ARROW=1`` flips to per-partition numpy XᵀX partials.  Both
paths compute E[xy] − E[x]E[y]; the Arrow path skips the fixed-point
quantization and accumulates in partition-dependent order, so the
contract is tolerance-based agreement scaled by the matrix magnitude
(raw relative error is meaningless on near-zero covariance entries
where E[xy] and E[x]E[y] cancel).

Measured on this host (local[32], sf0.1 embeddings replicated 10x,
warm): exact 5.8 s vs arrow 0.95 s — 6.1x; scale-relative max
difference 2.8e-11.  Timing is not asserted (multi-10x scheduler
noise, CLAUDE.md) — the speedup mechanism is asserted structurally:
one Python task per partition (MapInArrow node) and a #partials-sized
shuffle instead of a per-row x dim^2 explode.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def paths(spark, sf_dir):
    import adt_spark.operators.similarity as sim

    e = (
        sim._emb_covariance_exact(spark, sf_dir)
        .toPandas()
        .set_index(["i", "j"])["cov"]
        .sort_index()
    )
    a = (
        sim._emb_covariance_arrow(spark, sf_dir)
        .toPandas()
        .set_index(["i", "j"])["cov"]
        .sort_index()
    )
    return e, a


def test_arrow_agrees_with_exact_to_tolerance(paths):
    e, a = paths
    assert len(e) == len(a) == 2080  # full upper triangle, both paths
    assert list(e.index) == list(a.index)
    scale = float(np.abs(e).max())
    assert scale > 0
    assert float(np.abs(a - e).max()) / scale < 1e-9


def test_flag_dispatch(spark, sf_dir, monkeypatch):
    """ADT_COV_ARROW selects the Arrow plan; default stays exact."""
    import adt_spark.operators.similarity as sim

    monkeypatch.delenv("ADT_COV_ARROW", raising=False)
    default_plan = sim.emb_covariance(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in default_plan
    monkeypatch.setenv("ADT_COV_ARROW", "1")
    arrow_plan = sim.emb_covariance(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in arrow_plan


def test_arrow_path_shuffle_is_partial_sized(spark, sf_dir):
    """The Arrow plan's only wide stage aggregates #partials x 2,080
    tiny rows — the per-row explode (Generate over the corpus scan
    BEFORE aggregation) must not appear below the Python node."""
    import adt_spark.operators.similarity as sim

    plan = sim._emb_covariance_arrow(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    # the posexplode of the (i, j) index table sits ABOVE the Python
    # node (operates on partials), never below it (on the corpus)
    assert plan.index("Generate") < plan.index("MapInArrow")
