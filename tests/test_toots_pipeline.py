"""Golden end-to-end test of the toot pipeline (reference parity).

Synthesizes a sample.jsonl-shaped fixture (the reference's only data
fixture is 135 captured toots + junk lines; we generate our own with the
same pathologies per FIXTURES.md: mixed timestamp formats, junk lines,
duplicate ids, empty texts) and runs raw -> clean -> analytics.
"""

from __future__ import annotations

import json

import pytest

from projet_5spar_sparkstreaming_spark.plans.toots import (
    analytics_suite,
    clean_toots,
    top_hashtag_per_day,
)
from projet_5spar_sparkstreaming_spark.sources.files import read_jsonl_events


def _toot(i, ts, user="alice", text="hello world", tags=None, lang="en"):
    return json.dumps(
        {
            "id": str(i),
            "created_at": ts,
            "language": lang,
            "text": text,
            "hashtags": tags or [],
            "user_id": "1",
            "username": user,
            "display_name": user.title(),
            "favourites": 0,
            "reblogs": 0,
            "replies": 0,
            "url": f"https://masto.test/@{user}/{i}",
        }
    )


@pytest.fixture(scope="module")
def raw_toots(spark, tmp_path_factory):
    lines = [
        _toot(1, "2025-10-03 18:14:46.665000+00:00", "alice", "first #spark post", ["spark"]),
        _toot(2, "2025-10-03 18:20:46+00:00", "bob", "bonjour #ai", ["ai"]),
        _toot(3, "2025-10-03T19:14:46.665Z", "alice", "more #spark stuff", ["spark"]),
        _toot(4, "2025-10-04T10:00:00Z", "carol", "next day #data", ["data"]),
        # duplicate id 1: newer created_at must win
        _toot(1, "2025-10-03 18:30:00+00:00", "alice", "first post EDITED", ["spark"]),
        # null-ish rows: empty text, missing username -> dropped by clean
        json.dumps({"id": "5", "created_at": "2025-10-04T10:00:00Z", "text": "   ", "username": "dave"}),
        json.dumps({"id": "6", "created_at": "2025-10-04T10:00:00Z", "text": "ok"}),
        # junk lines (reference sample.jsonl has msg1/msg2/msg3); the
        # blank line sits mid-file — a trailing one would be swallowed
        # by the text source's final-newline handling
        "msg1",
        "",
        "msg2",
    ]
    p = tmp_path_factory.mktemp("toots") / "sample.jsonl"
    p.write_text("\n".join(lines))
    return read_jsonl_events(spark, str(p))


def test_parse_drops_nothing_silently(raw_toots):
    # junk lines become all-null rows (PERMISSIVE), kept until clean
    assert raw_toots.count() == 10


def test_clean_dedups_and_filters(raw_toots):
    clean = clean_toots(raw_toots)
    rows = {r["id"]: r for r in clean.collect()}
    # ids: 1 (deduped), 2, 3, 4; 5 empty text, 6 no username, junk dropped
    assert set(rows) == {"1", "2", "3", "4"}
    assert rows["1"]["text"] == "first post EDITED"  # latest wins
    assert rows["1"]["created_at"].minute == 30


def test_analytics_suite_golden(raw_toots):
    clean = clean_toots(raw_toots)
    suite = analytics_suite(clean)

    daily = {str(r["day"]): r["toots"] for r in suite["daily_toot_counts"].collect()}
    assert daily == {"2025-10-03": 3, "2025-10-04": 1}

    activity = {
        r["username"]: r["toot_count"] for r in suite["user_activity_counts"].collect()
    }
    assert activity == {"alice": 2, "bob": 1, "carol": 1}

    tags = {
        (str(r["day"]), r["hashtag"]): r["cnt"]
        for r in suite["hashtags_per_day_counts"].collect()
    }
    assert tags[("2025-10-03", "spark")] == 2
    assert tags[("2025-10-04", "data")] == 1

    top = {str(r["day"]): r["hashtag"] for r in top_hashtag_per_day(clean).collect()}
    assert top["2025-10-03"] == "spark"

    avg_len = {
        r["username"]: r["avg_len"]
        for r in suite["avg_toot_length_by_user_batch"].collect()
    }
    assert avg_len["bob"] == float(len("bonjour #ai"))


def test_stream_batch_parity_definition(raw_toots):
    """T8: the same operator definition serves batch and foreachBatch."""
    from projet_5spar_sparkstreaming_spark.plans.toots import avg_toot_length_by_user

    clean = clean_toots(raw_toots)
    a = {r["username"]: r["avg_len"] for r in avg_toot_length_by_user(clean).collect()}
    b = {r["username"]: r["avg_len"] for r in avg_toot_length_by_user(clean).collect()}
    assert a == b


def test_materialize_suite_partitioned(raw_toots, tmp_path):
    from projet_5spar_sparkstreaming_spark.plans.materialize import materialize_suite

    clean = clean_toots(raw_toots)
    paths = materialize_suite(clean, str(tmp_path / "wh"))
    assert set(paths) == {
        "hourly_toot_counts",
        "daily_toot_counts",
        "user_activity_counts",
        "active_users",
        "hashtags_per_day_counts",
        "top_hashtag_per_day",
        "avg_toot_length_by_user_batch",
    }
    spark = raw_toots.sparkSession
    daily = spark.read.parquet(paths["daily_toot_counts"])
    assert {str(r["day"]): r["toots"] for r in daily.collect()} == {
        "2025-10-03": 3,
        "2025-10-04": 1,
    }
    # day-partitioned layout on disk (partition pruning works)
    import os

    assert any(
        d.startswith("day=") for d in os.listdir(paths["daily_toot_counts"])
    )
