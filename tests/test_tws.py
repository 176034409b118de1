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

import importlib.util

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


# --- shim <-> real-protobuf wire equivalence (r8 verdict item 8) ----------

# Runs in a clean subprocess so the runtime under test is chosen by
# sys.path alone: "shim" prepends the vendored portion (shadowing any
# installed wheel), "real" uses site-packages as-is.
_WIRE_CORPUS_SCRIPT = r'''
import sys
mode = sys.argv[1]
if mode == "shim":
    sys.path.insert(0, sys.argv[2])
import google.protobuf as gp
is_shim = "protoshim" in (getattr(gp, "__file__", "") or "")
assert (mode == "shim") == is_shim, (mode, getattr(gp, "__file__", ""))
import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
msgs = [
    sm.StateRequest(version=2, statefulProcessorCall=sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.CREATED))),
    sm.StateRequest(version=1),
    sm.StateResponse(statusCode=0),            # all defaults -> empty wire
    sm.StateResponse(statusCode=3, errorMessage="bad", value=b"hi"),
    sm.StateResponseWithLongTypeVal(statusCode=0, value=77),  # explicit 0
    sm.StateResponseWithStringTypeVal(value="abc"),
    sm.ListStatePut(value=[b"a", b"", b"bb"], fetchWithArrow=True),
    sm.ListStatePut(),
    sm.StateCallCommand(stateName="s1", schema="a INT"),
    sm.RegisterTimer(expiryTimestampMs=123456789),
    sm.ImplicitGroupingKeyRequest(setImplicitKey=sm.SetImplicitKey(key=b"gk")),
    sm.SetHandleState(state=0),                # enum default -> empty wire
]
out = [m.SerializeToString().hex() for m in msgs]
r = sm.StateResponse(); r.ParseFromString(bytes.fromhex("080112036261641a026869"))
out.append(f"{r.statusCode}|{r.errorMessage}|{r.value.hex()}")
p = sm.ListStatePut(); p.ParseFromString(msgs[6].SerializeToString())
out.append(f"{[v.hex() for v in p.value]}|{p.fetchWithArrow}")
print("\n".join(out))
'''

# Canonical proto3 encodings of the corpus (implicit presence: plain
# scalars at their default are ABSENT from the wire; oneof members and
# message fields keep explicit presence).
_WIRE_GOLDEN = [
    "080212040a020801",
    "0801",
    "",
    "080312036261641a026869",
    "184d",
    "1a03616263",
    "0a01610a000a0262621001",
    "",
    "0a02733112056120494e54",
    "08959aef3a",
    "0a040a02676b",
    "",
    "1|bad|6869",
    "['61', '', '6262']|True",
]


def _run_wire_corpus(mode: str) -> list[str]:
    import os
    import subprocess
    import sys

    from gistdex_spark.vendor import _SHIM_DIR

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # parent session may have shimmed it
    args = [sys.executable, "-c", _WIRE_CORPUS_SCRIPT, mode]
    if mode == "shim":
        args.append(_SHIM_DIR)
    r = subprocess.run(args, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    # keep trailing empty lines (empty hex IS a result): split manually
    return r.stdout.rstrip("\n").split("\n")


def test_shim_wire_corpus_matches_golden():
    """UN-gated: the shim must produce the canonical proto3 encodings
    (incl. implicit presence — explicitly-set default scalars stay off
    the wire, matching what the real runtime would emit)."""
    assert _run_wire_corpus("shim") == _WIRE_GOLDEN


def _real_protobuf_available() -> bool:
    """True only for a GENUINE wheel: if ensure_protobuf already ran in
    this process, find_spec would resolve the vendored portion — which
    must not arm the gate (the 'real' subprocess would then fail to
    import anything)."""
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:
        return False
    return spec is not None and "protoshim" not in (spec.origin or "")


@pytest.mark.skipif(
    not _real_protobuf_available(),
    reason="real protobuf wheel not installed",
)
def test_shim_wire_equivalence_with_real_protobuf():
    """GATED on the real wheel: byte-identical StateMessage round-trips
    under both runtimes, same corpus, same subprocess harness — the
    equivalence the TWS control channel relies on when a cluster DOES
    ship protobuf (r8 verdict item 8)."""
    real = _run_wire_corpus("real")
    shim = _run_wire_corpus("shim")
    assert real == shim
    assert real == _WIRE_GOLDEN
