"""Pins for the vendored minimal protobuf runtime (quarkus_etl_spark/
vendor/gproto): activation semantics and wire-format round-trips through
the REAL generated StateMessage_pb2 module pyspark ships. The conclusive
cross-language check is the tws e2e test (test_streaming.py::
test_user_stats_tws_matches_batch — Python shim encoding parsed by the
JVM's real protobuf and vice versa)."""

import pytest

from quarkus_etl_spark.vendor import ensure_protobuf


@pytest.fixture(scope="module")
def sm():
    assert ensure_protobuf()
    import google.protobuf

    # must be a REAL package (a jar's google/protobuf/*.proto resources
    # masquerade as an origin-less namespace package — the bug this pins)
    assert google.protobuf.__file__ is not None
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_nested_oneof_roundtrip(sm):
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(
                stateName="s1",
                schema="value double",
                ttl=sm.TTLConfig(durationMs=5000),
            )
        ),
    )
    out = sm.StateRequest()
    out.ParseFromString(req.SerializeToString())
    assert out.version == 2
    assert out.WhichOneof("method") == "statefulProcessorCall"
    call = out.statefulProcessorCall.getValueState
    assert (call.stateName, call.schema, call.ttl.durationMs) == (
        "s1", "value double", 5000,
    )


def test_repeated_and_defaults(sm):
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    out = sm.StateResponseWithMapIterator()
    out.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in out.kvPair] == [(b"k1", b"v1"), (b"k2", b"v2")]
    assert out.requireNextFetch is True
    assert out.errorMessage == ""  # unset scalar -> proto3 default
    assert out.statusCode == 0  # default scalar: not on wire, reads back 0

    put = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=False)
    out2 = sm.ListStatePut()
    out2.ParseFromString(put.SerializeToString())
    assert out2.value == [b"a", b"bb"] and out2.fetchWithArrow is False


def test_negative_int64_ten_byte_varint(sm):
    ti = sm.TimerInfo(timestampMs=-1)
    blob = ti.SerializeToString()
    out = sm.TimerInfo()
    out.ParseFromString(blob)
    assert out.timestampMs == -1
    # spec: negative varints ride as 64-bit two's complement (10 bytes)
    assert b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01" in blob


def test_enum_constants_and_unknown_field_skip(sm):
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.CLOSED) == (0, 1, 2, 5)
    # a message with an extra unknown field must parse (forward compat)
    base = sm.StateResponse(statusCode=7).SerializeToString()
    unknown = bytes([15 << 3 | 0, 42])  # field 15, varint 42
    out = sm.StateResponse()
    out.ParseFromString(base + unknown)
    assert out.statusCode == 7
