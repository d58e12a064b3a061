"""Scale-tier generator (tools/gen_scale_tier.py) invariants — r6 verdict
item 2 asks for a pytest pinning generator determinism so the measured
scaling curve (SCALING.md) is reproducible."""

import duckdb
import pytest

from tools.gen_scale_tier import cipher_alphabet, dim_permutation, generate

BASE = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _content_hashes(con, out: str) -> dict:
    h = {}
    for t in TABLES:
        # order-insensitive whole-table content hash (file split may differ
        # between runs; row content must not)
        h[t] = con.execute(
            f"SELECT SUM(hash(d))::HUGEINT, COUNT(*) "
            f"FROM '{out}/{t}.parquet/*.parquet' d"
        ).fetchone()
    return h


@pytest.mark.slow
def test_generator_deterministic_and_shape_preserving(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(BASE, a, copies=2)
    generate(BASE, b, copies=2)
    con = duckdb.connect()
    ha, hb = _content_hashes(con, a), _content_hashes(con, b)
    assert ha == hb, "two runs must produce identical table content"
    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        base_n = con.execute(f"SELECT COUNT(*) FROM '{BASE}/{t}.parquet'").fetchone()[0]
        assert ha[t][1] == 2 * base_n, t
    for t in ("region", "nation"):
        base_n = con.execute(f"SELECT COUNT(*) FROM '{BASE}/{t}.parquet'").fetchone()[0]
        assert ha[t][1] == base_n, t
    # copy 0 is the base verbatim; copy 1 text differs per-row but
    # preserves length (letter-rotation cipher)
    stride = (
        con.execute(f"SELECT MAX(doc_id) + 1 FROM '{BASE}/documents.parquet'").fetchone()[0]
    )
    diff, lenmatch, n = con.execute(
        f"""
        WITH d AS (SELECT doc_id, text FROM '{a}/documents.parquet/*.parquet')
        SELECT SUM((x.text <> y.text)::INT), SUM((len(x.text) = len(y.text))::INT), COUNT(*)
        FROM d x JOIN d y ON y.doc_id = x.doc_id + {stride}
        """
    ).fetchone()
    assert n > 0 and diff == n and lenmatch == n
    same_base = con.execute(
        f"""
        SELECT COUNT(*) FROM '{BASE}/documents.parquet' b
        JOIN '{a}/documents.parquet/*.parquet' s USING (doc_id)
        WHERE b.text <> s.text
        """
    ).fetchone()[0]
    assert same_base == 0
    # referential integrity holds for the shifted keys
    orphans = con.execute(
        f"""
        SELECT COUNT(*) FROM '{a}/lineitem.parquet/*.parquet' l
        LEFT JOIN '{a}/orders.parquet/*.parquet' o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        """
    ).fetchone()[0]
    assert orphans == 0


def test_cipher_and_permutation_constants():
    src0, dst0 = cipher_alphabet(0)
    assert src0 == dst0, "copy 0 must be the identity cipher"
    src1, dst1 = cipher_alphabet(1)
    assert src1 == src0 and dst1 != dst0
    assert sorted(dst1) == sorted(dst0), "cipher must be a bijection"
    assert dim_permutation(0) == list(range(64))
    p1, p2 = dim_permutation(1), dim_permutation(2)
    assert sorted(p1) == list(range(64)) and p1 != list(range(64))
    assert p1 != p2, "copies need distinct permutations"
    assert dim_permutation(1) == p1, "permutation must be a pure function of copy"
