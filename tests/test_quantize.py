"""Int8 embedding quantization + q8 near-dup verify
(similarity.quantize_embeddings / near_dup_pairs_q8).

Hand-computed quantization vectors (round away from zero on both
engines), the zero-vector guards, and pair semantics in q8 space.
DuckDB value parity runs in test_driver_contract.py (SUBSET) and
tests/parity_harness.py.
"""

from __future__ import annotations

from two_tier_document_parser_spark.similarity import (
    near_dup_pairs_q8,
    quantize_embeddings,
)

SCHEMA = "vec_id long, embedding array<float>"


def _emb(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_quantize_known_vector(spark):
    df = _emb(spark, [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])])
    got = {r.vec_id: list(r.q8) for r in quantize_embeddings(df).collect()}
    # scale 1.0: 127*1=127; 127*-0.5=-63.5 -> -64 (away from zero);
    # 127*0.25=31.75 -> 32; zero vector stays all-zero, no NaN
    assert got == {1: [127, -64, 32, 0], 2: [0, 0, 0, 0]}


def test_quantize_scale_invariance(spark):
    # q8 depends only on the vector's direction: x and 1000x quantize
    # identically (per-vector max-abs scale)
    df = _emb(
        spark,
        [(1, [0.1, -0.05, 0.025]), (2, [100.0, -50.0, 25.0])],
    )
    got = {r.vec_id: list(r.q8) for r in quantize_embeddings(df).collect()}
    assert got[1] == got[2] == [127, -64, 32]


def test_q8_pair_semantics(spark):
    df = _emb(
        spark,
        [
            (1, [1.0, 0.0]),       # parallel to 2 -> cosine 1
            (2, [0.5, 0.0]),
            (3, [0.0, 1.0]),       # orthogonal -> cosine 0
            (4, [0.0, 0.0]),       # zero vector: never pairs
            (5, [0.8, 0.6]),       # cos vs (1,0) = 0.8 >= 0.44
        ],
    )
    pairs = {
        (r.a, r.b) for r in near_dup_pairs_q8(df, threshold_x100=44).collect()
    }
    assert (1, 2) in pairs
    assert (1, 5) in pairs and (2, 5) in pairs
    assert (3, 5) in pairs  # cos = 0.6 in q8 space too
    assert all(4 not in p for p in pairs)
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_q8_matches_bruteforce_q8(spark):
    # at full-recall LSH parameters the q8 scale path returns exactly
    # the q8 brute-force pair set (same guarantee the float
    # emb_near_dups_lsh oracle relies on), and the candidate pipeline
    # is shared with the float path (signatures read floats)
    import numpy as np

    from two_tier_document_parser_spark.similarity import (
        lsh_near_dup_pairs_q8,
    )

    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
        if i % 5 == 0:  # planted near-copy
            w = np.asarray(rows[-1][1]) + 0.01 * rng.standard_normal(16)
            rows.append((i + 1000, [float(x) for x in w / np.linalg.norm(w)]))
    df = _emb(spark, rows)
    brute = {
        (r.a, r.b) for r in near_dup_pairs_q8(df, threshold_x100=80).collect()
    }
    lsh = {
        (r.a, r.b)
        for r in lsh_near_dup_pairs_q8(
            df, threshold_x100=80, n_planes=4, n_tables=48
        ).collect()
    }
    assert brute  # the planted copies are above threshold
    assert lsh == brute


def test_quantize_at_ingest_roundtrip(spark, tmp_path):
    """The "q8 at rest" layout: quantize once, snapshot-commit, read
    back — the committed table must be byte-identical to the inline
    quantization, carry array<tinyint>, and feed
    lsh_near_dup_pairs_q8(q8_table=...) to the same pair set."""
    import numpy as np

    from two_tier_document_parser_spark.similarity import (
        lsh_near_dup_pairs_q8,
        quantize_at_ingest,
    )

    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        v = rng.standard_normal(8)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
        if i % 4 == 0:
            w = np.asarray(rows[-1][1]) + 0.02 * rng.standard_normal(8)
            rows.append((i + 500, [float(x) for x in w / np.linalg.norm(w)]))
    df = _emb(spark, rows)
    path = str(tmp_path / "q8_table")
    at_rest = quantize_at_ingest(spark, df, path)
    # committed via the manifest protocol
    import json
    import os

    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    assert manifest["runs"] == ["q8"]
    assert dict(at_rest.dtypes)["q8"] == "array<tinyint>"
    inline = {
        r.vec_id: list(r.q8) for r in quantize_embeddings(df).collect()
    }
    stored = {r.vec_id: list(r.q8) for r in at_rest.collect()}
    assert stored == inline
    from_disk = {
        (r.a, r.b)
        for r in lsh_near_dup_pairs_q8(
            df, threshold_x100=80, n_planes=4, n_tables=48, q8_table=at_rest
        ).collect()
    }
    brute = {
        (r.a, r.b) for r in near_dup_pairs_q8(df, threshold_x100=80).collect()
    }
    assert from_disk == brute


def test_semantic_dedup_q8_table_path(spark, tmp_path):
    """semantic_dedup(q8_table=...) must produce the same
    (id, rep_id, keep) set as the float verify when no pair sits
    within quantization error of the threshold (planted clusters at
    cosine ~0.997 vs threshold 0.80)."""
    import numpy as np

    from two_tier_document_parser_spark.similarity import (
        quantize_at_ingest,
        semantic_dedup,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(0, 200, 10):
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        rows.append((i, [float(x) for x in base]))
        for j in (1, 2):
            v = base + 0.02 * rng.standard_normal(16)
            v /= np.linalg.norm(v)
            rows.append((i + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q8 = quantize_at_ingest(spark, df, str(tmp_path / "q8"))
    fl = {(r.vec_id, r.rep_id, r.keep)
          for r in semantic_dedup(df, threshold_x100=80).collect()}
    qq = {(r.vec_id, r.rep_id, r.keep)
          for r in semantic_dedup(df, threshold_x100=80,
                                  q8_table=q8).collect()}
    assert fl == qq
    # the planted clusters really collapse: 20 kept of 60
    assert sum(k for _, _, k in fl) == 20


def test_semantic_rep_by_score_q8_table_path(spark, tmp_path):
    """semantic_rep_by_score(q8_table=...): same keep-best-rep output
    as the float verify on planted clusters far from the threshold."""
    import numpy as np

    from two_tier_document_parser_spark.similarity import (
        quantize_at_ingest,
        semantic_rep_by_score,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(0, 120, 10):
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        # score rises with the member index, so the BEST member of
        # each planted cluster is i+2, never the smallest id
        rows.append((i, [float(x) for x in base], float(i % 7)))
        for j in (1, 2):
            v = base + 0.02 * rng.standard_normal(16)
            v /= np.linalg.norm(v)
            rows.append((i + j, [float(x) for x in v], float(i % 7) + j))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label double"
    )
    q8 = quantize_at_ingest(spark, df, str(tmp_path / "q8"))
    fl = {(r.vec_id, r.rep_id, r.keep)
          for r in semantic_rep_by_score(df, threshold_x100=80).collect()}
    qq = {(r.vec_id, r.rep_id, r.keep)
          for r in semantic_rep_by_score(df, threshold_x100=80,
                                         q8_table=q8).collect()}
    assert fl == qq
    # best-scoring member (i+2) represents every 3-member cluster
    reps = {r for _, r, k in fl if k == 1}
    assert reps == {i + 2 for i in range(0, 120, 10)}


def test_incremental_semantic_dedup_old_q8_table(spark, tmp_path):
    """incremental_semantic_dedup(old_q8_table=...): identical
    (id, status, matched_old) rows to the float verify — the
    committed corpus lives q8-at-rest, the new batch quantizes
    inline."""
    import numpy as np

    from two_tier_document_parser_spark.similarity import (
        incremental_semantic_dedup,
        quantize_at_ingest,
    )

    rng = np.random.default_rng(11)
    old_rows, new_rows = [], []
    for i in range(0, 100, 10):
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        old_rows.append((i, [float(x) for x in base]))
        if i % 20 == 0:  # half the new batch duplicates a committed vector
            v = base + 0.02 * rng.standard_normal(16)
            v /= np.linalg.norm(v)
            new_rows.append((1000 + i, [float(x) for x in v]))
        else:
            v = rng.standard_normal(16)
            v /= np.linalg.norm(v)
            new_rows.append((1000 + i, [float(x) for x in v]))
    schema = "vec_id long, embedding array<float>"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    q8_old = quantize_at_ingest(spark, old, str(tmp_path / "q8_old"))
    fl = {(r.vec_id, r.status, r.matched_old)
          for r in incremental_semantic_dedup(
              new, old, threshold_x100=80).collect()}
    qq = {(r.vec_id, r.status, r.matched_old)
          for r in incremental_semantic_dedup(
              new, old, threshold_x100=80,
              old_q8_table=q8_old).collect()}
    assert fl == qq
    dups = {i for i, s, _ in fl if s == "dup"}
    assert dups == {1000 + i for i in range(0, 100, 20)}
