"""Lakehouse maintenance: OPTIMIZE (bin-pack + Z-order + DV purge),
VACUUM, snapshot expiry, Iceberg compaction — content-equality checked
against the readers, commit forms checked against the protocols."""

from __future__ import annotations

import json
import os
import struct

import pytest

from intake_spark import datatypes as dt
from intake_spark.lakehouse import DeltaLakeReader, IcebergTableReader
from intake_spark.maintenance import (
    delta_optimize,
    delta_vacuum,
    iceberg_compact,
    iceberg_expire_snapshots,
)


def _mk_delta(spark, root, parts=False):
    from intake_spark.output import to_delta

    for i in range(3):
        df = spark.createDataFrame(
            [(i * 10 + j, f"s{j % 2}", float(j)) for j in range(10)],
            "id long, src string, x double",
        )
        to_delta(
            df, root, mode="overwrite" if i == 0 else "append",
            partition_by=["src"] if parts and i == 0 else None,
        )


def _delta_files(root):
    return [
        os.path.relpath(os.path.join(dp, f), root)
        for dp, _d, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in dp
    ]


def test_delta_optimize_binpack(spark, tmp_path):
    root = str(tmp_path / "opt")
    _mk_delta(spark, root)
    before = {(r.id, r.src, r.x) for r in DeltaLakeReader(
        data=dt.DeltalakeTable(url=root)).read(spark=spark).collect()}
    n_before = len(_delta_files(root))
    assert n_before >= 3
    res = delta_optimize(root, spark=spark)
    assert res["removed"] >= 3 and res["added"] >= 1
    rdr = DeltaLakeReader(data=dt.DeltalakeTable(url=root))
    after = {(r.id, r.src, r.x) for r in rdr.read(spark=spark).collect()}
    assert after == before
    assert rdr.data.metadata["n_files"] < n_before
    # dataChange: false on every remove+add of the OPTIMIZE commit
    with open(os.path.join(
            root, "_delta_log", f"{res['version']:020d}.json")) as f:
        acts = [json.loads(x) for x in f if x.strip()]
    for a in acts:
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False
    assert any(
        a.get("commitInfo", {}).get("operation") == "OPTIMIZE" for a in acts
    )
    # time travel to the pre-optimize version still works (files on disk)
    v0 = rdr.read(spark=spark, version=res["version"] - 1)
    assert {(r.id, r.src, r.x) for r in v0.collect()} == before
    # idempotent: nothing left to compact
    assert delta_optimize(root, spark=spark)["removed"] == 0


def test_delta_optimize_partitioned_zorder(spark, tmp_path):
    root = str(tmp_path / "optz")
    _mk_delta(spark, root, parts=True)
    before = {(r.id, r.src, r.x) for r in DeltaLakeReader(
        data=dt.DeltalakeTable(url=root)).read(spark=spark).collect()}
    res = delta_optimize(root, spark=spark, zorder_by=["id", "x"])
    assert res["added"] >= 1
    after_df = DeltaLakeReader(data=dt.DeltalakeTable(url=root)).read(
        spark=spark)
    assert {(r.id, r.src, r.x) for r in after_df.collect()} == before
    # hive layout preserved for the partitioned table
    assert any(d.startswith("src=") for d in os.listdir(root))
    # string zorder key rejected by name
    with pytest.raises(ValueError, match="Z-order"):
        delta_optimize(root, spark=spark, zorder_by=["src"])


def test_delta_optimize_purges_deletion_vectors(spark, tmp_path):
    import uuid as _uuid
    import zlib as _zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.test_lakehouse import _delta_meta, _ser_roaring64, _z85_encode

    root = str(tmp_path / "dvp")
    os.makedirs(f"{root}/_delta_log")
    pq.write_table(pa.table({"id": pa.array(range(8), pa.int64())}),
                   f"{root}/f0.parquet")
    u = _uuid.uuid4()
    bm = _ser_roaring64([1, 5])
    with open(f"{root}/deletion_vector_{u}.bin", "wb") as f:
        f.write(b"\x01" + struct.pack(">I", len(bm)) + bm
                + struct.pack(">I", _zlib.crc32(bm)))
    schema_json = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}}]}
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(_delta_meta(schema_json) + "\n")
        f.write(json.dumps({"add": {
            "path": "f0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": {
                "storageType": "u", "pathOrInlineDv": _z85_encode(u.bytes),
                "offset": 1, "sizeInBytes": len(bm), "cardinality": 2,
            }}}) + "\n")
    res = delta_optimize(root, spark=spark)
    assert res["removed"] == 1
    state_adds = []
    with open(os.path.join(
            root, "_delta_log", f"{res['version']:020d}.json")) as f:
        for line in f:
            a = json.loads(line)
            if "add" in a:
                state_adds.append(a["add"])
    assert state_adds and all(not a.get("deletionVector") for a in state_adds)
    got = sorted(r.id for r in DeltaLakeReader(
        data=dt.DeltalakeTable(url=root)).read(spark=spark).collect())
    assert got == [0, 2, 3, 4, 6, 7]


def test_delta_vacuum(spark, tmp_path):
    root = str(tmp_path / "vac")
    _mk_delta(spark, root)
    res = delta_optimize(root, spark=spark)
    n_all = len(_delta_files(root))
    # within retention: nothing deletable
    assert delta_vacuum(root, spark=spark) == []
    # retention below the 7-day floor is refused unless overridden
    # (Delta's retentionDurationCheck)
    with pytest.raises(ValueError, match="168h"):
        delta_vacuum(root, spark=spark, retention_hours=0)
    assert len(_delta_files(root)) == n_all
    dry = delta_vacuum(root, spark=spark, retention_hours=0, dry_run=True,
                       enforce_retention=False)
    assert dry and len(_delta_files(root)) == n_all  # dry run deletes nothing
    gone = delta_vacuum(root, spark=spark, retention_hours=0,
                        enforce_retention=False)
    assert gone == dry
    rdr = DeltaLakeReader(data=dt.DeltalakeTable(url=root))
    assert rdr.read(spark=spark).count() == 30  # current read intact
    # time travel to the pre-optimize version is now broken (by design)
    with pytest.raises(Exception):
        rdr.read(spark=spark, version=res["version"] - 1).collect()


def test_delta_optimize_commit_race_cleans_up(spark, tmp_path, monkeypatch):
    """A concurrent writer claiming the next version between the state
    read and the commit must not leave the moved-in rewrite files as
    unreferenced orphans: optimize deletes them and raises
    ConcurrentWriteError; the table stays intact at the winner's
    version."""
    import intake_spark.lakehouse as lh
    from intake_spark.maintenance import ConcurrentWriteError

    root = str(tmp_path / "race")
    _mk_delta(spark, root)
    # a pre-existing empty directory the optimize did NOT create must
    # survive the lost-race cleanup (the sweep is scoped to created dirs)
    preexisting_empty = os.path.join(root, "src=preexisting")
    os.makedirs(preexisting_empty)
    before = {(r.id, r.src, r.x) for r in DeltaLakeReader(
        data=dt.DeltalakeTable(url=root)).read(spark=spark).collect()}
    files_before = set(_delta_files(root))
    real_state = lh.delta_log_state

    def racing_state(log, *a, **kw):
        state = real_state(log, *a, **kw)
        # simulate the concurrent writer winning the next version
        nxt = os.path.join(log, f"{state['version'] + 1:020d}.json")
        with open(nxt, "w") as f:
            f.write(json.dumps({"commitInfo": {"operation": "WRITE"}}) + "\n")
        return state

    monkeypatch.setattr(lh, "delta_log_state", racing_state)
    with pytest.raises(ConcurrentWriteError, match="commit race"):
        delta_optimize(root, spark=spark)
    monkeypatch.undo()
    # no orphans: only the pre-existing data files remain
    assert set(_delta_files(root)) == files_before
    assert os.path.isdir(preexisting_empty)
    after = {(r.id, r.src, r.x) for r in DeltaLakeReader(
        data=dt.DeltalakeTable(url=root)).read(spark=spark).collect()}
    assert after == before


def test_iceberg_expire_skips_paths_outside_root(spark, tmp_path):
    """A stale/moved metadata 'location' makes manifest paths resolve
    verbatim; expire must never os.remove() anything outside the table
    root (realpath containment)."""
    import shutil

    from intake_spark.output import to_iceberg

    root_a = str(tmp_path / "orig")
    for i in range(3):
        df = spark.createDataFrame([(i, float(i))], "id long, x double")
        to_iceberg(df, root_a, mode="overwrite")
    # simulate a table moved without rewriting its metadata: the copy's
    # manifests still hold absolute paths under root_a, and the
    # 'location' field is stale so local() falls through verbatim
    root_b = str(tmp_path / "moved")
    shutil.copytree(root_a, root_b)
    mdir = os.path.join(root_b, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        v = int(f.read().strip())
    mp = os.path.join(mdir, f"v{v}.metadata.json")
    meta = json.load(open(mp))
    meta["location"] = "file:///stale/nowhere"
    with open(mp, "w") as f:
        json.dump(meta, f)
    a_files = {
        os.path.join(dp, fn)
        for dp, _d, fs in os.walk(root_a) for fn in fs
    }
    res = iceberg_expire_snapshots(root_b, keep_last=1)
    assert res["expired"] == 2
    assert res["skipped_outside_root"]  # root_a paths were refused
    # every original file survives
    assert all(os.path.exists(p) for p in a_files)
    # the original table (correct location) still expires normally
    res_a = iceberg_expire_snapshots(root_a, keep_last=1)
    assert res_a["expired"] == 2 and not res_a["skipped_outside_root"]


def test_dv_length_prefix_collision_uses_crc(tmp_path):
    """_dv_file_positions: a descriptor pointing straight at the bitmap
    whose first 4 bytes (read big-endian) coincidentally equal
    sizeInBytes must NOT be misparsed as a length-prefixed read — the
    trailing CRC32 disambiguates."""
    from intake_spark.lakehouse import _dv_file_positions
    from tests.test_lakehouse import _ser_roaring64

    bm = _ser_roaring64([3, 7, 64])
    colliding_size = struct.unpack(">I", bm[:4])[0]  # BE view of LE magic
    p = str(tmp_path / "dv.bin")
    with open(p, "wb") as f:
        f.write(b"\x01" + bm)
    # old behavior shifted the offset by 4 and raised on bad magic;
    # the CRC check rejects the prefixed interpretation and the direct
    # read (slice clamps past EOF) parses correctly
    assert _dv_file_positions(p, 1, colliding_size) == [3, 7, 64]


def test_iceberg_expire_snapshots(spark, tmp_path):
    from intake_spark.output import to_iceberg

    root = str(tmp_path / "exp")
    for i in range(3):
        df = spark.createDataFrame(
            [(i, float(i))], "id long, x double")
        to_iceberg(df, root, mode="overwrite")
    rdr = IcebergTableReader(data=dt.IcebergDataset(url=root))
    assert rdr.read(spark=spark).count() == 1
    dry = iceberg_expire_snapshots(root, keep_last=1, dry_run=True)
    assert dry["expired"] == 2 and dry["deleted_files"]
    res = iceberg_expire_snapshots(root, keep_last=1)
    assert res["expired"] == 2
    for p in res["deleted_files"]:
        assert not os.path.exists(p)
    # current snapshot still reads; expired snapshot ids are gone
    r2 = IcebergTableReader(data=dt.IcebergDataset(url=root))
    assert [r.id for r in r2.read(spark=spark).collect()] == [2]
    with open(os.path.join(root, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    meta = json.load(open(os.path.join(root, "metadata",
                                       f"v{v}.metadata.json")))
    assert len(meta["snapshots"]) == 1


def test_iceberg_compact_partitioned(spark, tmp_path):
    from intake_spark.output import to_iceberg

    root = str(tmp_path / "cmp")
    for i in range(3):
        df = spark.createDataFrame(
            [(i * 10 + j, f"s{j % 2}", float(j)) for j in range(8)],
            "id long, src string, x double")
        to_iceberg(df, root, mode="overwrite" if i == 0 else "append",
                   partition_by=["src"])
    rdr = IcebergTableReader(data=dt.IcebergDataset(url=root))
    before = {(r.id, r.src) for r in rdr.read(spark=spark).collect()}
    n_before = rdr.data.metadata["n_files"]
    iceberg_compact(root, spark=spark)
    r2 = IcebergTableReader(data=dt.IcebergDataset(url=root))
    after = {(r.id, r.src) for r in r2.read(spark=spark).collect()}
    assert after == before
    assert r2.data.metadata["n_files"] <= n_before
    # spec preserved (identity on src)
    with open(os.path.join(root, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    meta = json.load(open(os.path.join(root, "metadata",
                                       f"v{v}.metadata.json")))
    fields = meta["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in fields] == [
        ("src", "identity")]


def test_delta_optimize_nonhive_partitioned(spark, tmp_path):
    """partitionValues in the log are authoritative; a partitioned table
    whose files are NOT hive-laid-out must optimize via the literal-fill
    path — basePath discovery would rewrite null partition columns."""
    root = str(tmp_path / "nonhive")
    os.makedirs(f"{root}/_delta_log")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            {"name": "ds", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    adds = []
    for i, (ds, vals) in enumerate([("a", [1, 2]), ("a", [3]), ("b", [4, 5])]):
        d = f"{root}/blob{i}"
        spark.createDataFrame([(v,) for v in vals], "v long").coalesce(1) \
            .write.parquet(d)
        fn = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        adds.append((f"blob{i}/{fn}", {"ds": ds}))
    meta = json.dumps(
        {"metaData": {"id": "m1", "schemaString": json.dumps(schema),
                      "partitionColumns": ["ds"], "configuration": {},
                      "format": {"provider": "parquet", "options": {}}}}
    )
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write(meta + "\n")
        for p, pv in adds:
            f.write(json.dumps({"add": {
                "path": p, "partitionValues": pv, "size": 1,
                "modificationTime": 0, "dataChange": True,
            }}) + "\n")

    before = sorted(
        (r.v, r.ds)
        for r in DeltaLakeReader(data=dt.DeltalakeTable(url=root))
        .read(spark=spark).collect()
    )
    assert before == [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")]

    res = delta_optimize(root, spark=spark)
    assert res["removed"] >= 2  # the two-file 'a' group at minimum
    after = sorted(
        (r.v, r.ds)
        for r in DeltaLakeReader(data=dt.DeltalakeTable(url=root))
        .read(spark=spark).collect()
    )
    assert after == before  # partition values survived the rewrite


def test_dv_prefixed_crc_mismatch_raises(tmp_path):
    """Review finding: a length-prefixed DV whose trailing CRC32 fails
    must RAISE, not silently re-read the same bytes 4 bytes shifted; a
    prefixed DV whose file is too short to hold the CRC still parses
    (writers that omit the checksum)."""
    import zlib

    from intake_spark.lakehouse import _dv_file_positions
    from tests.test_lakehouse import _ser_roaring64

    bm = _ser_roaring64([2, 9])
    good = b"\x01" + struct.pack(">I", len(bm)) + bm + struct.pack(
        ">I", zlib.crc32(bm)
    )
    p = str(tmp_path / "ok.bin")
    with open(p, "wb") as f:
        f.write(good)
    assert _dv_file_positions(p, 1, len(bm)) == [2, 9]
    # corrupt the CRC -> refuse to guess
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    p2 = str(tmp_path / "bad.bin")
    with open(p2, "wb") as f:
        f.write(bad)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="CRC32 mismatch"):
        _dv_file_positions(p2, 1, len(bm))
    # prefixed but NO CRC written: still parses as prefixed
    p3 = str(tmp_path / "nocrc.bin")
    with open(p3, "wb") as f:
        f.write(b"\x01" + struct.pack(">I", len(bm)) + bm)
    assert _dv_file_positions(p3, 1, len(bm)) == [2, 9]
