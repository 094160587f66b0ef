"""Tier engine tests (FIXTURES.md §B5): incremental refresh ≡ full
recompute, rerun-after-kill is a no-op, retention drops partitions,
token-array invariance through the pipeline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etna_spark.operators.rollup import rollup
from etna_spark.plans.tiers import TierEngine
from etna_spark.synth import token_table


@pytest.fixture(scope="module")
def tokens_df(spark):
    return token_table(spark, 4000, with_tokens=False).cache()


def _tiers_equal(a, b, keys=("source", "bucket_ts")):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_incremental_refresh_equals_full(spark, tokens_df, tmp_path):
    """Two-snapshot ingestion (70/30 split) then refresh twice ≡ one-shot."""
    inc = TierEngine(str(tmp_path / "inc"))
    full = TierEngine(str(tmp_path / "full"))

    part1 = tokens_df.filter(F.xxhash64("doc_id") % 10 < 7)
    part2 = tokens_df.filter(F.xxhash64("doc_id") % 10 >= 7)

    inc.input.append(part1)
    r1 = inc.refresh(spark)
    assert not r1["1m"]["skipped"]
    inc.input.append(part2)
    r2 = inc.refresh(spark)
    assert not r2["1m"]["skipped"]

    full.input.append(tokens_df)
    full.refresh(spark)

    for tier in ("1m", "1h", "1d"):
        a = inc.tier_df(spark, tier)
        b = full.tier_df(spark, tier)
        assert _tiers_equal(a, b), f"tier {tier} incremental != full"
        # and both equal a direct rollup from raw
        direct = rollup(tokens_df, tier).withColumn(
            "part_day", F.date_format("bucket_ts", "yyyy-MM-dd")
        )
        assert _tiers_equal(a.select(*direct.columns), direct)


def test_rerun_is_noop(spark, tokens_df, tmp_path):
    eng = TierEngine(str(tmp_path / "wh"))
    eng.input.append(tokens_df)
    eng.refresh(spark)
    snap_before = {t: eng.tiers[t].current_snapshot_id() for t in ("1m", "1h", "1d")}
    r = eng.refresh(spark)  # nothing new appended
    assert all(v["skipped"] for v in r.values())
    snap_after = {t: eng.tiers[t].current_snapshot_id() for t in ("1m", "1h", "1d")}
    assert snap_before == snap_after


def test_resume_after_kill(spark, tokens_df, tmp_path):
    """Checkpoint = snapshot property → data commit + watermark advance are
    atomic. Kill scenarios:
    (a) mid-write (staged files exist, log not swapped) → rerun converges to
        the clean result, orphans ignored;
    (b) after commit → rerun is a no-op with identical content."""
    eng = TierEngine(str(tmp_path / "wh"))
    eng.input.append(tokens_df)
    eng.refresh(spark)

    extra = token_table(spark, 500, with_tokens=False).withColumn(
        "doc_id", F.concat(F.lit("x_"), "doc_id")
    )
    eng.input.append(extra)

    # (a) simulate a job killed mid-write: stage orphan files into the tier
    # table dir without committing the snapshot log
    eng.tiers["1m"]._stage_df(extra.limit(10))
    eng.refresh(spark)
    content = sorted(map(tuple, eng.tier_df(spark, "1m").collect()))

    # reference: clean engine over the same total input
    clean = TierEngine(str(tmp_path / "clean"))
    clean.input.append(tokens_df)
    clean.input.append(extra)
    clean.refresh(spark)
    expected = sorted(map(tuple, clean.tier_df(spark, "1m").collect()))
    assert content == expected

    # (b) rerun after successful commit: no-op, identical content
    r = eng.refresh(spark)
    assert all(v["skipped"] for v in r.values())
    again = sorted(map(tuple, eng.tier_df(spark, "1m").collect()))
    assert again == content


def test_lineage_and_metrics_recorded(spark, tokens_df, tmp_path):
    eng = TierEngine(str(tmp_path / "wh"))
    eng.input.append(tokens_df)
    eng.refresh(spark)
    recs = eng.manifest.records()
    kinds = {r["kind"] for r in recs}
    assert {"watermark", "lineage", "metrics"} <= kinds
    lineage = [r for r in recs if r["kind"] == "lineage" and r["tier"] == "1m"]
    assert lineage and all(
        {"partition", "rows_in", "points_out", "checksum"} <= set(r) for r in lineage
    )
    # lineage rows_in must cover the full input
    assert sum(r["rows_in"] for r in lineage) == tokens_df.count()


def test_retention_expires_partitions(spark, tokens_df, tmp_path):
    eng = TierEngine(str(tmp_path / "wh"))
    eng.input.append(tokens_df)
    eng.refresh(spark)
    days = sorted(
        r[0] for r in eng.tier_df(spark, "1m").select("part_day").distinct().collect()
    )
    assert len(days) >= 3  # synth window spans 3+ days
    victims = eng.expire("1m", keep_days=1, now_day=days[-1])
    assert victims == days[:-2]
    left = sorted(
        r[0] for r in eng.tier_df(spark, "1m").select("part_day").distinct().collect()
    )
    assert left == days[-2:]
    # other tiers untouched
    assert eng.tier_df(spark, "1d").select("part_day").distinct().count() == len(days)


def test_refresh_after_retention_no_double_count(spark, tokens_df, tmp_path):
    """Retention must not erase the tier watermark (snapshot properties):
    a refresh after expire sees only the NEW delta — no re-read of the whole
    input, no sum-merge double-counting, no resurrection of expired days."""
    eng = TierEngine(str(tmp_path / "wh"))
    eng.input.append(tokens_df)
    eng.refresh(spark)
    days = sorted(
        r[0] for r in eng.tier_df(spark, "1m").select("part_day").distinct().collect()
    )
    victims = eng.expire("1m", keep_days=1, now_day=days[-1])
    assert victims  # something actually expired

    # new data lands only in the surviving (latest) days
    extra = (
        token_table(spark, 500, with_tokens=False)
        .withColumn("doc_id", F.concat(F.lit("y_"), "doc_id"))
        .filter(F.date_format(F.date_trunc("minute", "event_ts"), "yyyy-MM-dd")
                .isin(days[-2:]))
    )
    assert extra.count() > 0
    eng.input.append(extra)
    r = eng.refresh(spark)
    assert not r["1m"]["skipped"]
    # only surviving-day partitions were touched
    assert set(r["1m"]["partitions"]) <= set(days[-2:])

    got = eng.tier_df(spark, "1m")
    # expired days stay expired
    left = {x[0] for x in got.select("part_day").distinct().collect()}
    assert left == set(days[-2:])
    # surviving days match a clean recompute over the full input (no
    # double-counted aggregates)
    expected = (
        rollup(tokens_df.unionByName(extra), "1m")
        .withColumn("part_day", F.date_format("bucket_ts", "yyyy-MM-dd"))
        .filter(F.col("part_day").isin(days[-2:]))
    )
    assert _tiers_equal(got.select(*expected.columns), expected)


def test_token_arrays_flow_through_untouched(spark, tmp_path):
    """input_hint invariant: the tokens column is byte-identical end-to-end
    through catalog append/read (the engine never mutates it)."""
    tt = token_table(spark, 300, with_tokens=True)
    eng = TierEngine(str(tmp_path / "wh"))
    eng.input.append(tt)
    back = eng.input.read(spark)
    orig = {r["doc_id"]: r["tokens"] for r in tt.collect()}
    got = {r["doc_id"]: r["tokens"] for r in back.collect()}
    assert orig == got
    checks = (
        back.withColumn(
            "ok",
            (F.size("tokens") == F.col("n_tok"))
            & (
                F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x)
                == F.aggregate(
                    "tokens", F.lit(0).cast("long"), lambda a, x: a + x
                )
            ),
        )
        .agg(F.min("ok"))
        .collect()[0][0]
    )
    assert checks is True
