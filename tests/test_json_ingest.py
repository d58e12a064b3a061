"""JSON ingestion scans (S1–S3): nested-document navigation, corrupt-record
tolerance, multi-page union — against landed fixture files."""

from __future__ import annotations

import json

from forgottenlandapp_etl_spark.sources import json_ingest


def _land(tmp_path, name, docs):
    p = tmp_path / name
    p.mkdir()
    for i, d in enumerate(docs):
        (p / f"part{i}.json").write_text(
            d if isinstance(d, str) else json.dumps(d)
        )
    return str(p)


def test_read_worlds_with_corrupt_and_nulls(spark, tmp_path):
    path = _land(
        tmp_path,
        "worlds",
        [
            {
                "worlds": {
                    "regular_worlds": [
                        {"name": "Antica", "location": "EU", "pvp_type": "Open"},
                        {"name": "Secura", "location": "EU", "pvp_type": "Optional"},
                    ]
                }
            },
            '{"worlds": broken json',  # corrupt → dropped, not fatal
            {"unexpected": {"shape": 1}},  # wrong path → null → dropped
        ],
    )
    got = sorted(r["name"] for r in json_ingest.read_worlds(spark, path).collect())
    assert got == ["Antica", "Secura"]


def test_read_highscores_pages_unions_and_tags(spark, tmp_path):
    def page(world, page_no, entries):
        return {
            "highscores": {
                "world": world,
                "category": "experience",
                "page": page_no,
                "list": entries,
            }
        }

    path = _land(
        tmp_path,
        "pages",
        [
            page(
                "Antica",
                1,
                [
                    {"rank": 1, "name": "alice", "vocation": "Knight",
                     "world": "Antica", "level": 100, "value": 5000},
                    {"rank": 2, "name": "bob", "vocation": "Druid",
                     "world": "Antica", "level": 80, "value": 4000},
                ],
            ),
            page(
                "Secura",
                1,
                [
                    {"rank": 1, "name": "carol", "vocation": "Paladin",
                     "world": "Secura", "level": 60, "value": 3000},
                ],
            ),
        ],
    )
    df = json_ingest.read_highscores_pages(spark, path)
    assert df.count() == 3
    by_world = {
        r["world"]: r["cnt"]
        for r in df.groupBy("world").count().withColumnRenamed("count", "cnt").collect()
    }
    assert by_world == {"Antica": 2, "Secura": 1}
    # nested fields surfaced as flat nullable columns
    alice = df.where("name = 'alice'").collect()[0]
    assert (alice["rank"], alice["level"], alice["value"]) == (1, 100, 5000)


def test_read_online_tags_world_from_document(spark, tmp_path):
    path = _land(
        tmp_path,
        "online",
        [
            {
                "world": {
                    "name": "Antica",
                    "online_players": [
                        {"name": "alice", "level": 100, "vocation": "Knight"},
                        {"name": "dave", "level": 9, "vocation": "None"},
                    ],
                }
            },
            {"world": {"name": "Empty", "online_players": None}},
        ],
    )
    df = json_ingest.read_online(spark, path)
    assert df.count() == 2
    assert set(r["world"] for r in df.collect()) == {"Antica"}


def test_field_level_mismatch_keeps_rest_of_page(spark, tmp_path):
    """One type-mismatched field must null that field only — not discard
    the whole 2-entry page (etl.dart:95-102 element-level tolerance)."""
    path = _land(
        tmp_path,
        "mixed",
        [
            {
                "highscores": {
                    "world": "Antica",
                    "category": "experience",
                    "page": 1,
                    "list": [
                        {"rank": 1, "name": "alice", "vocation": "Knight",
                         "world": "Antica", "level": "not-a-number", "value": 5000},
                        {"rank": 2, "name": "bob", "vocation": "Druid",
                         "world": "Antica", "level": 80, "value": 4000},
                    ],
                }
            }
        ],
    )
    rows = {r["name"]: r for r in json_ingest.read_highscores_pages(spark, path).collect()}
    assert set(rows) == {"alice", "bob"}
    assert rows["alice"]["level"] is None  # bad field nulled, row kept
    assert rows["bob"]["level"] == 80


def test_pretty_printed_page_parses(spark, tmp_path):
    """multiLine mode: a pretty-printed landed payload must parse, not
    silently become all-corrupt rows."""
    pretty = json.dumps(
        {"worlds": {"regular_worlds": [
            {"name": "Antica", "location": "EU", "pvp_type": "Open"}]}},
        indent=2,
    )
    path = _land(tmp_path, "pretty", [pretty])
    got = [r["name"] for r in json_ingest.read_worlds(spark, path).collect()]
    assert got == ["Antica"]
