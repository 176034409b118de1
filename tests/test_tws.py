"""transformWithStateInPandas (Spark 4 stateful API) running totals must
equal the batch per-user aggregate on the same input when the whole file
arrives as one AvailableNow backlog (Dataflow invariant).

The TWS Python driver worker speaks protobuf to the JVM
(pyspark/sql/streaming/proto/StateMessage_pb2.py). This container ships
no protobuf wheel, so `get_spark` installs the vendored mini runtime
(gistdex_spark/vendor/protoshim) onto PYTHONPATH before the JVM launches
— the generated StateMessage module runs on it unchanged, and this
parity test runs UN-GATED.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gistdex_spark.sources.tables import load_table
from tests.conftest import REPO_ROOT
from gistdex_spark.streaming.events import as_event_time
from gistdex_spark.streaming.tws import running_totals_stream

SF = "/root/testdata/sf0.001"


def test_shim_round_trips_state_messages():
    """The vendored runtime must wire-match real protobuf for the
    StateMessage schema (encoded bytes verified against the canonical
    encoding by hand: field 1 varint, nested length-delimited)."""
    from gistdex_spark.vendor import ensure_protobuf

    ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    assert req.SerializeToString() == bytes.fromhex("080212040a020801")
    resp = sm.StateResponse()
    resp.ParseFromString(b"\x08\x01\x12\x03bad\x1a\x02hi")
    assert (resp.statusCode, resp.errorMessage, resp.value) == (1, "bad", b"hi")
    put = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=True)
    rt = sm.ListStatePut()
    rt.ParseFromString(put.SerializeToString())
    assert rt.value == [b"a", b"bb"] and rt.fetchWithArrow is True


def test_tws_running_totals_match_batch(spark):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        batch = load_table(spark, SF, "events")
        stream = (
            spark.readStream.schema(
                spark.read.parquet(f"{SF}/events.parquet").schema
            )
            .option("pathGlobFilter", "events.parquet")
            .parquet(SF)
        )
        stream = as_event_time(stream)
        q = (
            running_totals_stream(stream)
            .writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(180)
            assert finished, "TWS AvailableNow backlog did not drain in 180s"
        finally:
            q.stop()
        got = {
            r.user_id: (r.n_events, round(r.total_value, 6))
            for r in spark.sql(
                "SELECT * FROM tws_totals"
            ).collect()
        }
        expected = {
            r.user_id: (r.n_events, round(r.total_value, 6))
            for r in (
                batch.groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum("value").alias("total_value"),
                )
                .collect()
            )
        }
        assert set(got) == set(expected)
        for uid, (n, _total) in expected.items():
            assert got[uid][0] == n, f"user {uid}: {got[uid]} != {(n, _total)}"
            # float totals: stream accumulates per-batch partial sums in a
            # different order than the batch hash agg; compare to 6 dp
            assert got[uid][1] == pytest.approx(_total, abs=1e-6)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_protoshim_does_not_shadow_other_google_packages(tmp_path):
    """The shim's `google` dir is a PEP-420 namespace PORTION (no
    __init__.py): on images that ship google-auth/google-api-core but no
    protobuf wheel, installing the shim must not break `import
    google.auth` — a regular package there would shadow the whole
    namespace."""
    import subprocess
    import sys
    import textwrap

    pkg = tmp_path / "google" / "auth"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("MARK = 'auth-ok'\n")
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {str(tmp_path)!r})
        sys.path.insert(0, {REPO_ROOT!r})
        from gistdex_spark.vendor import ensure_protobuf
        mode = ensure_protobuf()
        import google.auth
        import google.protobuf
        print(mode, google.auth.MARK)
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=60,
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = r.stdout.split()
    assert out[-1] == "auth-ok"
