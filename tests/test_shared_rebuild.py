"""rebuild_shared: the shared-line twin of the per-query quiet
re-measure (OPTIMIZATION_r12 §3). A rebuild must (a) time a genuinely
fresh build, not a cache hit, and (b) leave the shared table usable for
later consumers in the same session."""

from __future__ import annotations

from tests.conftest import SF_MEDIUM


def test_rebuild_shared_is_fresh_and_usable(spark):
    from intake_spark.llm import queries as q

    app = spark.sparkContext.applicationId
    key = (app, SF_MEDIUM)

    first = q._dup_spans_shared(spark, SF_MEDIUM)
    n0 = first.count()
    assert key in q._DUP_SPANS_CACHE

    secs = q.rebuild_shared(spark, SF_MEDIUM, "shared:dup_spans")
    # a cache hit times as microseconds; a real rebuild runs Spark jobs
    assert secs is not None and secs > 0.01
    rebuilt = q._DUP_SPANS_CACHE.get(key)
    assert rebuilt is not None and rebuilt is not first
    assert rebuilt.count() == n0


def test_rebuild_shared_unknown_label_is_none(spark):
    from intake_spark.llm.queries import rebuild_shared

    assert rebuild_shared(spark, SF_MEDIUM, "shared:nope") is None


def test_specs_cover_every_prewarm_label(spark):
    # prewarm_shared and rebuild_shared must stay in lockstep: every
    # billed label is rebuildable (the two warmup lines live in bench.py
    # and are deliberately not rebuildable)
    from intake_spark.llm.queries import _shared_build_specs

    specs = _shared_build_specs(spark, SF_MEDIUM)
    expected = {
        "shared:dup_spans", "shared:jaccard_pairs",
        "shared:jaccard_pairs_capped", "shared:semantic_pairs",
        "shared:direction", "shared:q135_store", "shared:q136_store",
        "shared:q137_store", "shared:q138_store", "shared:q140_store",
        "shared:q141_store",
    }
    assert set(specs) == expected
    for label, (inv, build) in specs.items():
        assert callable(inv) and callable(build), label
