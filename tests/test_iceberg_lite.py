"""avro_lite + iceberg_lite: spec byte fixtures, codec round-trips,
snapshot semantics (atomic hint commit, time travel, replay), and
manifest-level pruning."""

from __future__ import annotations

import io
import json
import os
import shutil

import pytest

from two_tier_document_parser_spark.avro_lite import (
    MAGIC,
    read_container,
    read_long,
    write_container,
    write_long,
)


# ------------------------------------------------- avro byte fixtures


def _enc_long(n: int) -> bytes:
    b = io.BytesIO()
    write_long(b, n)
    return b.getvalue()


def test_zigzag_varint_spec_fixtures():
    # the Avro spec's own table: 0->00, -1->01, 1->02, -2->03, 2->04,
    # -64->7f, 64->80 01
    assert _enc_long(0) == b"\x00"
    assert _enc_long(-1) == b"\x01"
    assert _enc_long(1) == b"\x02"
    assert _enc_long(-2) == b"\x03"
    assert _enc_long(2) == b"\x04"
    assert _enc_long(-64) == b"\x7f"
    assert _enc_long(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 64, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        assert read_long(io.BytesIO(_enc_long(n))) == n


def test_container_header_is_spec_magic():
    blob = write_container(
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]},
        [{"x": 7}],
    )
    assert blob[:4] == MAGIC == b"Obj\x01"


def test_container_roundtrip_all_types_both_codecs():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long", "field-id": 1},
            {"name": "s", "type": "string", "field-id": 2},
            {"name": "o", "type": ["null", "long"], "default": None},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "double"},
            {"name": "by", "type": "bytes"},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "n",
                    "fields": [
                        {"name": "x", "type": "int"},
                        {"name": "m", "type": {"type": "map", "values": "string"}},
                    ],
                },
            },
            {"name": "arr", "type": {"type": "array", "items": "long"}},
        ],
    }
    recs = [
        {
            "a": -(2**62),
            "s": "héllo wörld",
            "o": None,
            "b": True,
            "d": -2.5,
            "by": b"\x00\xff",
            "nested": {"x": -7, "m": {"k1": "v1", "k2": ""}},
            "arr": [1, -2, 3],
        },
        {
            "a": 0,
            "s": "",
            "o": 42,
            "b": False,
            "d": 0.0,
            "by": b"",
            "nested": {"x": 0, "m": {}},
            "arr": [],
        },
    ]
    for codec in ("deflate", "null"):
        blob = write_container(schema, recs, codec=codec)
        s2, got, meta = read_container(blob)
        assert got == recs
        assert s2 == schema
        assert meta["avro.codec"] == codec.encode()
        # byte-identical re-serialization (replay rule)
        assert write_container(schema, recs, codec=codec) == blob
    assert read_container(write_container(schema, []))[1] == []


def test_container_field_ids_survive():
    schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [{"name": "p", "type": "string", "field-id": 500}],
    }
    s2, _, _ = read_container(write_container(schema, [{"p": "x"}]))
    assert s2["fields"][0]["field-id"] == 500


# --------------------------------------------------- iceberg_lite IO


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (i, f"text {i}", "en" if i % 2 else "de", f"s{i % 3}", 10 + i)
            for i in range(30)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture()
def table(spark, tmp_path):
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO

    return IcebergLiteIO(
        spark, str(tmp_path / "t"), partition_by="source"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_read_two_snapshots(table, docs):
    from pyspark.sql import functions as F

    s1 = table.append(docs.filter(F.col("doc_id") < 10), run_id="r1")
    s2 = table.append(docs.filter(F.col("doc_id") >= 10), run_id="r2")
    assert (s1, s2) == (1, 2)
    assert table.committed_runs() == ["r1", "r2"]
    assert _rows(table.read()) == _rows(docs)
    # time travel: snapshot 1 sees only the first append
    assert _rows(table.read(snapshot_id=s1)) == _rows(
        docs.filter(F.col("doc_id") < 10)
    )
    assert [h["snapshot-id"] for h in table.history()] == [1, 2]


def test_partition_pruning_drops_files(table, docs):
    table.append(docs, run_id="r1")
    all_files = table._data_files()
    pruned = table._data_files(partition_filter={"source": "s1"})
    assert 0 < len(pruned) < len(all_files)
    from pyspark.sql import functions as F

    assert _rows(table.read(partition_filter={"source": "s1"})) == _rows(
        docs.filter(F.col("source") == "s1")
    )


def test_version_hint_is_the_commit_point(table, docs):
    from pyspark.sql import functions as F

    table.append(docs.filter(F.col("doc_id") < 10), run_id="r1")
    table.append(docs.filter(F.col("doc_id") >= 10), run_id="r2")
    # simulate a crash BEFORE the hint swap of commit 2: every other
    # artifact of v2 exists on disk, but the hint still names v1 —
    # readers must see only snapshot 1
    with open(table._hint, "w") as f:
        f.write("1")
    assert table.committed_runs() == ["r1"]
    assert _rows(table.read()) == _rows(docs.filter(F.col("doc_id") < 10))


def test_replay_overwrites_crashed_staging(table, docs):
    # a crashed earlier attempt left junk in staging and data dirs
    os.makedirs(os.path.join(table.path, "_staging_r1"), exist_ok=True)
    with open(
        os.path.join(table.path, "_staging_r1", "junk"), "w"
    ) as f:
        f.write("crash leftovers")
    os.makedirs(os.path.join(table.data_dir, "r1"), exist_ok=True)
    table.append(docs, run_id="r1")
    assert _rows(table.read()) == _rows(docs)
    assert not os.path.exists(os.path.join(table.path, "_staging_r1"))


def test_metadata_is_v2_spec_shaped(table, docs):
    table.append(docs, run_id="r1")
    md = json.load(
        open(os.path.join(table.meta_dir, "v1.metadata.json"))
    )
    assert md["format-version"] == 2
    assert md["current-snapshot-id"] == 1
    spec = md["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "identity"
    assert spec["field-id"] == 1000
    snap = md["snapshots"][0]
    assert snap["summary"]["operation"] == "append"
    # the manifest list is a decodable Avro container whose entries
    # carry the spec's manifest_file field names
    mf = read_container(open(snap["manifest-list"], "rb").read())[1]
    assert mf and {"manifest_path", "added_snapshot_id"} <= set(mf[0])
    entries = read_container(
        open(mf[0]["manifest_path"], "rb").read()
    )[1]
    assert entries[0]["status"] == 1
    assert entries[0]["data_file"]["file_format"] == "PARQUET"
    assert entries[0]["data_file"]["record_count"] > 0


def test_fast_append_adds_one_manifest_per_commit(table, docs):
    from pyspark.sql import functions as F

    table.append(docs.filter(F.col("doc_id") < 10), run_id="r1")
    table.append(docs.filter(F.col("doc_id") >= 10), run_id="r2")
    md = table._metadata()
    snap2 = next(s for s in md["snapshots"] if s["snapshot-id"] == 2)
    mf = read_container(open(snap2["manifest-list"], "rb").read())[1]
    # snapshot 2's list = snapshot 1's manifest by reference + one new
    assert len(mf) == 2
    assert {m["added_snapshot_id"] for m in mf} == {1, 2}


def test_unpartitioned_table(spark, tmp_path, docs):
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO

    t = IcebergLiteIO(spark, str(tmp_path / "u"))
    t.append(docs, run_id="r1")
    assert _rows(t.read()) == _rows(docs)


def test_open_table_dispatches_iceberg_lite(spark, tmp_path):
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO
    from two_tier_document_parser_spark.table_io import open_table

    t = open_table(
        spark, f"iceberg-lite:{tmp_path}/x?partition=source"
    )
    assert isinstance(t, IcebergLiteIO)
    assert t.partition_by == "source"
    u = open_table(spark, f"iceberg-lite:{tmp_path}/y")
    assert isinstance(u, IcebergLiteIO) and u.partition_by is None


def test_nested_schema_gets_spec_ids(spark, tmp_path):
    """The north-rule table shape — spans: array<struct<...>> — maps
    to the spec's list/struct JSON with unique field ids."""
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO

    df = spark.createDataFrame(
        [("d1", [("text", "hello", None, 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    t = IcebergLiteIO(spark, str(tmp_path / "n"))
    t.append(df, run_id="r1")
    md = t._metadata()
    fields = md["schemas"][0]["fields"]
    spans = next(f for f in fields if f["name"] == "spans")
    assert spans["type"]["type"] == "list"
    inner = spans["type"]["element"]
    assert [f["name"] for f in inner["fields"]] == [
        "kind",
        "text",
        "media_ref",
        "offset",
    ]

    def all_ids(t, acc):
        if isinstance(t, dict):
            for k, v in t.items():
                if k in ("id", "element-id", "key-id", "value-id"):
                    acc.append(v)
                else:
                    all_ids(v, acc)
        elif isinstance(t, list):
            for x in t:
                all_ids(x, acc)
        return acc

    ids = all_ids(fields, [])
    assert len(ids) == len(set(ids))  # unique table-wide
    assert md["last-column-id"] == max(ids)
    got = t.read().collect()
    assert got[0]["spans"][0]["text"] == "hello"


def test_unsupported_column_type_fails_loudly(spark, tmp_path):
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO

    df = spark.createDataFrame([(1,)], "a long").selectExpr(
        "CAST(a AS DECIMAL(10,2)) AS a"
    )
    t = IcebergLiteIO(spark, str(tmp_path / "z"))
    with pytest.raises(TypeError):
        t.append(df, run_id="r1")


def test_non_string_partition_column_rejected(spark, tmp_path):
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO

    df = spark.createDataFrame([(1, "x")], "k long, v string")
    t = IcebergLiteIO(spark, str(tmp_path / "p"), partition_by="k")
    with pytest.raises(TypeError):
        t.append(df, run_id="r1")


def test_checkpointed_extract_resumes_from_iceberg_snapshot(
    spark, tmp_path
):
    """The north rule's resume clause on the REAL layout: a crashed
    half-run commits one Iceberg snapshot; the resumed full run
    processes only the remainder into a second snapshot; a third run
    is a no-op; lineage covers both productive runs."""
    from two_tier_document_parser_spark.checkpoint import (
        CheckpointedExtract,
    )
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO
    from two_tier_document_parser_spark.synth import synth_spark

    target = f"iceberg-lite:{tmp_path}/out"
    ck = CheckpointedExtract(spark, target)
    assert isinstance(ck.data, IcebergLiteIO)

    half = synth_spark(spark, 60, 42, partitions=4)
    run1 = ck.run(half, mode="fused")
    assert ck.result().count() == 60
    assert ck.data.read_run(run1).count() == 60

    full = synth_spark(spark, 120, 42, partitions=4)
    run2 = ck.run(full, mode="fused")
    res = ck.result()
    assert res.count() == 120
    assert res.select("doc_id").distinct().count() == 120
    assert ck.data.read_run(run2).count() == 60  # only the remainder

    run3 = ck.run(full, mode="fused")
    assert ck.result().count() == 120
    assert ck.data.read_run(run3).count() == 0

    lin = ck.metrics().collect()
    assert sum(r.n_docs for r in lin if r.run_id in (run1, run2)) == 120
    # and the sink really is the v2 layout: snapshots accumulated
    assert ck.data.committed_runs() == [run1, run2, run3]


def test_compact_preserves_rows_and_shrinks_files(table, docs):
    from pyspark.sql import functions as F

    for i in range(4):  # many tiny appends -> small-files problem
        table.append(
            docs.filter(F.col("doc_id") % 4 == i), run_id=f"r{i}"
        )
    before = len(table._data_files())
    pre_snap = table._metadata()["current-snapshot-id"]
    table.compact(run_id="maint")
    after = len(table._data_files())
    assert after < before
    assert _rows(table.read()) == _rows(docs)
    # pruning still works off the rewritten manifests
    assert _rows(table.read(partition_filter={"source": "s1"})) == _rows(
        docs.filter(F.col("source") == "s1")
    )
    # prior snapshots stay time-travelable through their own lists
    assert len(_rows(table.read(snapshot_id=pre_snap))) == len(
        _rows(docs)
    )
    md = table._metadata()
    cur = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    assert cur["summary"]["operation"] == "replace"
    # replace list carries ONLY the rewrite's manifest
    mf = read_container(open(cur["manifest-list"], "rb").read())[1]
    assert {m["added_snapshot_id"] for m in mf} == {
        md["current-snapshot-id"]
    }


def test_expire_snapshots_vacuums_unreferenced_files(table, docs):
    from pyspark.sql import functions as F

    table.append(docs.filter(F.col("doc_id") < 15), run_id="r1")
    table.append(docs.filter(F.col("doc_id") >= 15), run_id="r2")
    table.compact(run_id="maint")
    old_files = {
        d["file_path"] for d in table._data_files(snapshot_id=2)
    }
    deleted = table.expire_snapshots(keep_last=1)
    # the pre-compaction data files are gone from disk
    assert old_files <= set(deleted)
    for fp in old_files:
        assert not os.path.exists(fp)
    # current read unaffected, old snapshot no longer resolvable
    assert _rows(table.read()) == _rows(docs)
    assert len(table._metadata()["snapshots"]) == 1
    with pytest.raises(ValueError):
        table.read(snapshot_id=1)
    # expiry itself was a hint-swap commit (new metadata version)
    assert table._current_version() >= 4


def test_column_bounds_prune_files_and_rows_exact(table, docs):
    from pyspark.sql import functions as F

    # four appends of disjoint doc_id ranges -> files with disjoint
    # recorded bounds
    for i in range(4):
        lo, hi = i * 8, (i + 1) * 8
        table.append(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ),
            run_id=f"r{i}",
        )
    all_files = table._data_files()
    pruned = table._data_files(column_range={"doc_id": (0, 7)})
    assert 0 < len(pruned) < len(all_files)
    # every surviving file's recorded lower bound is in range
    got = _rows(table.read(column_range={"doc_id": (3, 17)}))
    want = _rows(
        docs.filter((F.col("doc_id") >= 3) & (F.col("doc_id") <= 17))
    )
    assert got == want
    # bounds are present and spec-encoded (8-byte LE longs)
    d = all_files[0]
    lows = {kv["key"]: kv["value"] for kv in d["lower_bounds"]}
    assert any(len(v) == 8 for v in lows.values())


def test_copy_on_write_delete(table, docs):
    from pyspark.sql import functions as F

    for i in range(3):
        lo, hi = i * 10, (i + 1) * 10
        table.append(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ),
            run_id=f"r{i}",
        )
    before = {d["file_path"] for d in table._data_files()}
    table.delete("doc_id", [3, 7], run_id="gdpr1")
    got = _rows(table.read())
    want = _rows(docs.filter(~F.col("doc_id").isin([3, 7])))
    assert got == want
    after = {d["file_path"] for d in table._data_files()}
    # untouched files carried BY PATH (no rewrite); only the files
    # whose bounds overlapped the deleted ids were replaced
    carried = before & after
    assert carried  # run r1/r2 ranges don't contain 3 or 7
    # doc_ids 3 and 7 live in run r0's range only -> r0 files gone
    assert all("/r0/" not in p for p in after - carried)
    md = table._metadata()
    cur = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    assert cur["summary"]["operation"] == "overwrite"
    # pre-delete snapshot still shows the rows (until expiry)
    assert len(_rows(table.read(snapshot_id=3))) == 30
    # and expiry makes the purge physical
    table.expire_snapshots(keep_last=1)
    assert _rows(table.read()) == want
    with pytest.raises(ValueError):
        table.read(snapshot_id=3)


def test_stream_to_iceberg_exactly_once(spark, tmp_path):
    """Streaming extraction into the iceberg-lite table of record:
    the stream output equals the batch cascade, each micro-batch is
    one snapshot keyed by batch id, and a replayed batch is a no-op
    (exactly-once under at-least-once foreachBatch delivery)."""
    from two_tier_document_parser_spark.pipeline import (
        extract,
        ship_package,
    )
    from two_tier_document_parser_spark.streaming import (
        iceberg_sink_batch,
        run_stream_to_iceberg,
    )
    from two_tier_document_parser_spark.synth import synth_spark
    from two_tier_document_parser_spark.table_io import open_table

    ship_package(spark)
    raw_dir = str(tmp_path / "raw")
    target = f"iceberg-lite:{tmp_path}/tbl"
    ckpt = str(tmp_path / "ckpt")
    synth_spark(spark, 200, partitions=4).write.parquet(raw_dir)

    res = run_stream_to_iceberg(spark, raw_dir, target, ckpt)

    def canon(df):
        return {
            r["doc_id"]: (
                r["tier"],
                [
                    (s["kind"], s["text"], s["media_ref"], s["order"])
                    for s in r["spans"]
                ],
            )
            for r in df.collect()
        }

    batch = canon(
        extract(spark, spark.read.parquet(raw_dir), mode="fused")
    )
    assert canon(res) == batch

    # every committed snapshot is batch-id keyed
    t = open_table(spark, target)
    runs = t.committed_runs()
    assert runs and all(r.startswith("batch-") for r in runs)
    n_before = len(t._metadata()["snapshots"])

    # replay the first batch verbatim: must be a no-op, not a
    # double-append
    first_id = int(runs[0].split("-", 1)[1])
    sample = t.read().limit(5)
    iceberg_sink_batch(sample, first_id, t)
    assert len(t._metadata()["snapshots"]) == n_before
    assert canon(t.read()) == batch


def test_schema_evolution_add_column(table, docs):
    """ADD-column evolution: a later append carries a new primitive
    column; old files read back with typed nulls, field ids of
    existing columns are STABLE across the bump (what keeps bounds
    pruning working), and the schema id increments with both schemas
    retained in metadata."""
    from pyspark.sql import functions as F

    table.append(docs.filter(F.col("doc_id") < 15), run_id="r1")
    ids_before = {
        f["name"]: f["id"] for f in table._metadata()["schemas"][0]["fields"]
    }
    evolved = docs.filter(F.col("doc_id") >= 15).withColumn(
        "quality", (F.col("doc_id") * 10).cast("long")
    )
    table.append(evolved, run_id="r2")
    md = table._metadata()
    assert md["current-schema-id"] == 1
    assert [s["schema-id"] for s in md["schemas"]] == [0, 1]
    cur = table._current_fields(md)
    assert {f["name"]: f["id"] for f in cur if f["name"] in ids_before} == ids_before
    q = next(f for f in cur if f["name"] == "quality")
    assert q["id"] == md["last-column-id"]

    got = {r["doc_id"]: r["quality"] for r in table.read().collect()}
    assert len(got) == 30
    for i in range(15):
        assert got[i] is None  # pre-evolution rows null-filled
    for i in range(15, 30):
        assert got[i] == i * 10
    # bounds pruning on the ORIGINAL column still works post-bump
    pruned = table._data_files(column_range={"doc_id": (0, 14)})
    assert 0 < len(pruned) < len(table._data_files())


def test_schema_evolution_rejects_drops_and_type_changes(table, docs):
    from pyspark.sql import functions as F

    table.append(docs, run_id="r1")
    with pytest.raises(TypeError):
        table.append(docs.drop("lang"), run_id="r2")
    with pytest.raises(TypeError):
        table.append(
            docs.withColumn("n_chars", F.col("n_chars").cast("int")),
            run_id="r3",
        )
    with pytest.raises(TypeError):  # nested adds not supported
        table.append(
            docs.withColumn("tags", F.array(F.lit("a"))), run_id="r4"
        )


def test_avro_reader_rejects_junk_cleanly():
    """read_container on arbitrary junk raises (ValueError/EOFError/
    json/zlib/unicode errors) — it must never hang or return garbage
    silently. Deterministic pseudo-random corpus, no wall clock."""
    import hashlib

    from two_tier_document_parser_spark.avro_lite import (
        read_container as rc,
    )
    from two_tier_document_parser_spark.avro_lite import (
        write_container as wc,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    good = wc(schema, [{"x": i} for i in range(50)])
    corpora = [b"", b"Obj", b"Obj\x02", b"\x00" * 64]
    for i in range(64):
        seed = hashlib.sha256(f"avro-fuzz-{i}".encode()).digest()
        junk = (seed * 8)[: 17 + i * 7]
        corpora.append(junk)
        # bit-flipped / truncated valid containers
        pos = seed[0] % len(good)
        corpora.append(good[:pos] + bytes([good[pos] ^ 0xFF]) + good[pos + 1 :])
        corpora.append(good[: seed[1] % len(good)])
    ok = 0
    for blob in corpora:
        try:
            s, recs, _ = rc(blob)
            # a mutation may survive decode; it must still be sane
            assert isinstance(recs, list)
            ok += 1
        except Exception:
            pass
    # sanity: the harness isn't vacuous — most mutations are caught
    assert ok < len(corpora) // 2


def test_iceberg_to_iceberg_extraction(spark, tmp_path):
    """The north-rule sentence end-to-end: READ an Iceberg table of
    interleaved documents (current-snapshot manifest resolution),
    extract, COMMIT to an Iceberg table of record — and the output
    equals extracting the same rows read directly."""
    from two_tier_document_parser_spark.checkpoint import (
        CheckpointedExtract,
    )
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO
    from two_tier_document_parser_spark.pipeline import (
        extract,
        ship_package,
    )
    from two_tier_document_parser_spark.synth import synth_spark
    from two_tier_document_parser_spark.table_io import open_table

    ship_package(spark)
    raw = synth_spark(spark, 80, partitions=4)
    t_in = IcebergLiteIO(spark, str(tmp_path / "in"))
    t_in.append(raw, run_id="crawl")

    src = open_table(spark, f"iceberg-lite:{tmp_path}/in").read()
    ck = CheckpointedExtract(spark, f"iceberg-lite:{tmp_path}/out")
    ck.run(src, mode="fused")

    def canon(df):
        return {
            r["doc_id"]: (
                r["tier"],
                tuple(
                    (s["kind"], s["text"], s["media_ref"], s["order"])
                    for s in r["spans"]
                ),
            )
            for r in df.collect()
        }

    assert canon(ck.result()) == canon(
        extract(spark, raw, mode="fused")
    )


# ------------------------------------------- round-5 review findings


def test_drop_uncommitted_spares_carried_files_after_expiry(
    table, docs
):
    """Reachability, not run-id membership: after expiry drops old
    snapshots whose FILES the current snapshot still carries by
    reference, drop_uncommitted must not delete those files."""
    from pyspark.sql import functions as F

    table.append(docs.filter(F.col("doc_id") < 15), run_id="r1")
    table.append(docs.filter(F.col("doc_id") >= 15), run_id="r2")
    # r2's manifest list carries r1's manifest; expire to ONLY r2
    table.expire_snapshots(keep_last=1)
    table.drop_uncommitted()  # must treat data/r1 as live
    assert _rows(table.read()) == _rows(docs)
    # and genuinely dead dirs still go
    os.makedirs(os.path.join(table.data_dir, "orphan"), exist_ok=True)
    table.drop_uncommitted()
    assert not os.path.exists(os.path.join(table.data_dir, "orphan"))


def test_committed_run_id_reuse_refused(table, docs):
    """Replaying a COMMITTED run_id would rmtree files its snapshot
    references — refused loudly; crashed (uncommitted) staging is
    still replayable (covered by the staging-replay test)."""
    table.append(docs, run_id="r1")
    with pytest.raises(ValueError):
        table.append(docs, run_id="r1")
    with pytest.raises(ValueError):
        table.compact(run_id="r1")
    # history intact
    assert _rows(table.read()) == _rows(docs)


def test_delete_keeps_null_keyed_rows(spark, tmp_path):
    """~isin is NULL (not true) for NULL keys: the keep predicate
    must be NULL-safe or unrelated NULL-keyed rows silently vanish
    from rewritten files."""
    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO

    df = spark.createDataFrame(
        [(3, "a"), (None, "b"), (5, "c")], "doc_id long, text string"
    )
    t = IcebergLiteIO(spark, str(tmp_path / "n"))
    t.append(df.coalesce(1), run_id="r1")  # one file: bounds overlap 3
    t.delete("doc_id", [3], run_id="gdpr")
    got = sorted(
        ((r["doc_id"], r["text"]) for r in t.read().collect()),
        key=str,
    )
    assert (None, "b") in got and (5, "c") in got
    assert all(k != 3 for k, _ in got)


def test_partition_values_unescape_and_null(spark, tmp_path):
    """Hive-layout escaping (%3D etc.) and the NULL spelling
    (__HIVE_DEFAULT_PARTITION__) must round-trip to true values."""
    from pyspark.sql import functions as F

    from two_tier_document_parser_spark.iceberg_lite import IcebergLiteIO

    df = spark.createDataFrame(
        [(1, "a=b"), (2, "plain"), (3, None)],
        "doc_id long, source string",
    )
    t = IcebergLiteIO(spark, str(tmp_path / "p"), partition_by="source")
    t.append(df, run_id="r1")
    assert _rows(t.read()) == _rows(df)
    got = t.read(partition_filter={"source": "a=b"}).collect()
    assert [(r["doc_id"], r["source"]) for r in got] == [(1, "a=b")]


def test_full_delete_leaves_readable_empty_table(table, docs):
    """Deleting every row commits a zero-file snapshot; read() must
    return an EMPTY frame in the current schema, not raise — resume
    paths read legitimately empty tables."""
    table.append(docs, run_id="r1")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    table.delete("doc_id", ids, run_id="wipe")
    out = table.read()
    assert out.count() == 0
    assert out.columns == [f.name for f in docs.schema.fields]
