"""Merge-on-read: read-time view equals eager merge at every point,
later deltas win, tombstones hide at read and vanish at compaction."""

from __future__ import annotations

import os

import pytest

from dataworks_aws_corporate_data_ingestion_spark.operators import mor
from dataworks_aws_corporate_data_ingestion_spark.operators.mor import (
    compact,
    delta_fraction,
    read_merged,
    write_delta,
)


def _rows(spark, *triples):
    return spark.createDataFrame(
        [(i, t, v, i[:2]) for i, t, v in triples],
        "id string, db_type string, val string, id_part string",
    )


def _snap(spark, table_dir):
    return {
        r["id"]: (r["db_type"], r["val"]) for r in read_merged(spark, table_dir).collect()
    }


class TestMergeOnRead:
    def test_lifecycle(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        write_delta(_rows(spark, ("aa1", "INSERT", "v1"), ("bb2", "INSERT", "v2")), t)
        assert _snap(spark, t) == {"aa1": ("INSERT", "v1"), "bb2": ("INSERT", "v2")}

        # newer delta updates bb2, tombstones aa1, adds cc3
        write_delta(
            _rows(
                spark,
                ("bb2", "INSERT", "v9"),
                ("aa1", "DELETE", "v1"),
                ("cc3", "INSERT", "v3"),
            ),
            t,
        )
        assert _snap(spark, t) == {"bb2": ("INSERT", "v9"), "cc3": ("INSERT", "v3")}
        assert delta_fraction(spark, t) > 0

        compact(spark, t)
        # same logical view after compaction, deltas gone, base present
        assert _snap(spark, t) == {"bb2": ("INSERT", "v9"), "cc3": ("INSERT", "v3")}
        assert not os.path.exists(os.path.join(t, "deltas"))
        assert delta_fraction(spark, t) == 0.0

        # a key re-inserted after its tombstone compacted away comes back
        write_delta(_rows(spark, ("aa1", "INSERT", "v-new")), t)
        assert _snap(spark, t)["aa1"] == ("INSERT", "v-new")

    def test_within_batch_delete_beats_insert(self, spark, tmp_path):
        t = str(tmp_path / "tbl2")
        write_delta(
            _rows(spark, ("aa1", "INSERT", "v1"), ("aa1", "DELETE", "v1")), t
        )
        assert "aa1" not in _snap(spark, t)


class TestManifest:
    def test_manifest_is_authoritative_orphans_invisible(self, spark, tmp_path):
        """A crash between writing a batch directory and committing the
        manifest leaves an orphan dir; readers must not see it."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.mor import (
            read_manifest,
        )

        t = str(tmp_path / "tbl")
        write_delta(_rows(spark, ("aa1", "INSERT", "v1")), t)
        # simulate the torn write: batch parquet exists, manifest never updated
        orphan = _rows(spark, ("aa1", "INSERT", "SHOULD-NOT-WIN"))
        orphan.select("id", "db_type", "val", "id_part").write.parquet(
            os.path.join(t, "deltas", "batch-99999999999999999999-dead")
        )
        assert _snap(spark, t) == {"aa1": ("INSERT", "v1")}
        assert read_manifest(t)["deltas"] != []

    def test_pre_manifest_table_recovers_from_listing(self, spark, tmp_path):
        """Deleting the manifest (a pre-manifest table) falls back to
        sorted directory listing; the next write re-commits a manifest
        covering the recovered batches."""
        from dataworks_aws_corporate_data_ingestion_spark.operators.mor import (
            read_manifest,
        )

        t = str(tmp_path / "tbl")
        write_delta(_rows(spark, ("aa1", "INSERT", "v1")), t)
        write_delta(_rows(spark, ("aa1", "INSERT", "v2")), t)
        os.remove(os.path.join(t, "_manifest.json"))
        assert _snap(spark, t) == {"aa1": ("INSERT", "v2")}  # listing order
        write_delta(_rows(spark, ("bb2", "INSERT", "v3")), t)
        m = read_manifest(t)
        assert len(m["deltas"]) == 3  # recovered both + the new one, in order
        assert _snap(spark, t) == {
            "aa1": ("INSERT", "v2"),
            "bb2": ("INSERT", "v3"),
        }

    def test_compact_commits_empty_delta_list(self, spark, tmp_path):
        from dataworks_aws_corporate_data_ingestion_spark.operators.mor import (
            read_manifest,
        )

        t = str(tmp_path / "tbl")
        write_delta(_rows(spark, ("aa1", "INSERT", "v1")), t)
        v_before = read_manifest(t)["version"]
        compact(spark, t)
        m = read_manifest(t)
        assert m == {
            "version": v_before + 1,
            "base": True,
            "deltas": [],
            "base_rows": 1,
            "delta_rows": {},
        }

    def test_time_travel_versions(self, spark, tmp_path):
        from dataworks_aws_corporate_data_ingestion_spark.operators.mor import (
            read_manifest,
        )

        t = str(tmp_path / "tt")
        write_delta(_rows(spark, ("aa1", "INSERT", "v1")), t)   # version 1
        write_delta(_rows(spark, ("aa1", "INSERT", "v2")), t)   # version 2
        assert read_manifest(t)["version"] == 2

        v1 = {
            r["id"]: r["val"]
            for r in read_merged(spark, t, version=1).collect()
        }
        assert v1 == {"aa1": "v1"}  # the past, before the second delta
        assert _snap(spark, t)["aa1"] == ("INSERT", "v2")  # the present

    def test_stale_commit_raises_conflict(self, spark, tmp_path):
        """A commit derived from a superseded version must CAS-fail, not
        silently overwrite -- the conditional-PUT contract."""
        import pytest

        from dataworks_aws_corporate_data_ingestion_spark.operators import mor

        t = str(tmp_path / "cas")
        write_delta(_rows(spark, ("aa1", "INSERT", "v1")), t)  # version 1
        stale = mor.read_manifest(t)  # derived from version 1
        write_delta(_rows(spark, ("bb2", "INSERT", "v2")), t)  # version 2
        stale["version"] = int(stale["version"]) + 1  # would commit v2 again
        with pytest.raises(mor.ManifestConflict, match="expected version"):
            mor._commit_manifest(t, stale)
        # loser's failure left the winner's state intact
        assert mor.read_manifest(t)["version"] == 2
        assert len(mor.read_manifest(t)["deltas"]) == 2

    def test_delta_append_retries_past_conflict(self, spark, tmp_path, monkeypatch):
        """write_delta auto-retries: force its first state snapshot to be
        stale (as if another appender committed in between) and assert the
        commit still lands with every batch present."""
        from dataworks_aws_corporate_data_ingestion_spark.operators import mor

        t = str(tmp_path / "race")
        write_delta(_rows(spark, ("aa1", "INSERT", "v1")), t)
        real = mor.current_state
        seen = []

        def stale_once(table_dir):
            state = real(table_dir)
            if not seen:
                seen.append(1)
                state["version"] = int(state["version"]) - 1  # stale view
            return state

        monkeypatch.setattr(mor, "current_state", stale_once)
        write_delta(_rows(spark, ("bb2", "INSERT", "v2")), t)
        monkeypatch.setattr(mor, "current_state", real)
        assert len(seen) == 1  # the stale path was actually exercised
        m = mor.read_manifest(t)
        assert m["version"] == 2 and len(m["deltas"]) == 2
        assert _snap(spark, t) == {
            "aa1": ("INSERT", "v1"),
            "bb2": ("INSERT", "v2"),
        }

    def test_compaction_is_the_time_travel_boundary(self, spark, tmp_path):
        import pytest

        t = str(tmp_path / "ttc")
        write_delta(_rows(spark, ("aa1", "INSERT", "v1")), t)   # version 1
        compact(spark, t)                                       # version 2 + GC
        with pytest.raises(FileNotFoundError, match="garbage-collected"):
            read_merged(spark, t, version=1)
        assert _snap(spark, t)["aa1"] == ("INSERT", "v1")
        # post-compaction history starts fresh
        write_delta(_rows(spark, ("aa1", "INSERT", "v9")), t)   # version 3
        assert {
            r["val"] for r in read_merged(spark, t, version=2).collect()
        } == {"v1"}


class StubObjectStore:
    """In-memory HTTP object store with ETag conditional-write semantics
    (If-Match / If-None-Match), the wire contract of S3 conditional PUT."""

    def __init__(self):
        self.objects: dict[str, tuple[bytes, str]] = {}
        self.requests: list[tuple[str, str]] = []
        self._etag = 0
        self.on_conditional_put = None  # test hook: runs before the check

    def __call__(self, method, url, headers, body):
        self.requests.append((method, url))
        if method == "GET":
            if url not in self.objects:
                return 404, {}, None
            data, etag = self.objects[url]
            return 200, {"ETag": etag}, data
        assert method == "PUT"
        conditional = "If-Match" in headers or "If-None-Match" in headers
        if conditional and self.on_conditional_put:
            hook, self.on_conditional_put = self.on_conditional_put, None
            hook()
        current = self.objects.get(url)
        if "If-Match" in headers and (
            current is None or current[1] != headers["If-Match"]
        ):
            return 412, {}, None
        if "If-None-Match" in headers and current is not None:
            return 412, {}, None
        self._etag += 1
        etag = f'"{self._etag}"'
        self.objects[url] = (body, etag)
        return 200, {"ETag": etag}, None


class TestConditionalPutManifestStore:
    URL = "https://store.example/tables/t1/_manifest.json"

    def _store(self):
        from dataworks_aws_corporate_data_ingestion_spark.operators.mor_store import (
            ConditionalPutManifestStore,
        )

        transport = StubObjectStore()
        return ConditionalPutManifestStore(self.URL, transport), transport

    def test_create_and_load_roundtrip(self):
        store, transport = self._store()
        assert store.load() == (None, None)
        state = {"version": 1, "base": False, "deltas": ["b1"]}
        store.commit(state, None)  # If-None-Match: * create
        loaded, token = store.load()
        assert loaded == state
        assert token  # ETag present for the next CAS

    def test_stale_token_conflicts(self):
        from dataworks_aws_corporate_data_ingestion_spark.operators.mor_store import (
            ManifestConflict,
        )

        store, transport = self._store()
        store.commit({"version": 1, "base": False, "deltas": []}, None)
        _, stale = store.load()
        store.commit({"version": 2, "base": False, "deltas": ["x"]}, stale)
        with pytest.raises(ManifestConflict):
            store.commit({"version": 2, "base": False, "deltas": ["y"]}, stale)
        # create-precondition also conflicts once the object exists
        with pytest.raises(ManifestConflict):
            store.commit({"version": 1, "base": False, "deltas": []}, None)

    def test_cas_update_retries_past_interleaved_commit(self):
        from dataworks_aws_corporate_data_ingestion_spark.operators.mor_store import (
            cas_update,
        )

        store, transport = self._store()
        store.commit({"version": 1, "base": True, "deltas": ["b1"]}, None)

        def foreign_commit():
            # another appender lands between our load and our PUT
            st, tok = store.load()
            st = dict(st, version=st["version"] + 1, deltas=st["deltas"] + ["theirs"])
            store.commit(st, tok)

        transport.on_conditional_put = foreign_commit

        def append_mine(state):
            return dict(
                state,
                version=int(state["version"]) + 1,
                deltas=state["deltas"] + ["mine"],
            )

        final = cas_update(store, append_mine)
        # both appends survived: ours retried on top of theirs
        assert final["deltas"] == ["b1", "theirs", "mine"]
        assert final["version"] == 3
        loaded, _ = store.load()
        assert loaded == final

    def test_versioned_snapshots_enable_time_travel(self):
        store, transport = self._store()
        v1 = {"version": 1, "base": False, "deltas": []}
        v2 = {"version": 2, "base": False, "deltas": ["b1"]}
        store.commit(v1, None)
        _, tok = store.load()
        store.commit(v2, tok)
        assert store.load_version(1) == v1
        assert store.load_version(2) == v2
        assert store.load_version(9) is None

    def test_data_puts_are_never_conditional(self):
        """Only the manifest swap carries a precondition; the immutable
        .v{N} snapshot PUT must be unconditional (unique name)."""
        store, transport = self._store()
        store.commit({"version": 1, "base": False, "deltas": []}, None)
        puts = [u for m, u in transport.requests if m == "PUT"]
        assert puts == [self.URL + ".v1", self.URL]


class TestManifestRowCounts:
    def test_delta_fraction_is_metadata_only(self, spark, tmp_path):
        """After manifest-era appends and a compact, delta_fraction needs
        no SparkSession at all -- counts ride in the manifest."""
        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(str(i), "INSERT", f"v{i}", "00") for i in range(10)],
            "id string, db_type string, val string, id_part string",
        )
        mor.write_delta(base, t)
        mor.compact(spark, t)
        delta = spark.createDataFrame(
            [("3", "INSERT", "v3b", "00"), ("99", "INSERT", "v99", "00")],
            "id string, db_type string, val string, id_part string",
        )
        mor.write_delta(delta, t)
        m = mor.read_manifest(t)
        assert m["base_rows"] == 10
        assert list(m["delta_rows"].values()) == [2]
        # spark=None proves zero jobs: any data-file read would crash
        assert mor.delta_fraction(None, t) == 2 / 10

    def test_fallback_counts_pre_manifest_tables(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [("1", "INSERT", "v", "00")],
            "id string, db_type string, val string, id_part string",
        )
        mor.write_delta(df, t)
        os.remove(os.path.join(t, "_manifest.json"))  # pre-manifest table
        assert mor.delta_fraction(spark, t) == 1.0
