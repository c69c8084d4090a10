"""VInt codec (Hadoop WritableUtils wire format) and KV stream/sequence
file round trips."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import SF_SMOKE
from uda_spark.sources import hadoop_kv as HKV
from uda_spark.sources.tables import load_table


# Known byte patterns from the public WritableUtils spec.
KNOWN = [
    (0, b"\x00"),
    (127, b"\x7f"),
    (-112, bytes([(-112) & 0xFF])),
    (128, bytes([(-113) & 0xFF, 0x80])),           # 1-byte positive
    (-113, bytes([(-121) & 0xFF, 0x70])),          # 1-byte negative (~v = 112)
    (256, bytes([(-114) & 0xFF, 0x01, 0x00])),     # 2-byte positive
    (2**31 - 1, bytes([(-116) & 0xFF, 0x7F, 0xFF, 0xFF, 0xFF])),
]


@pytest.mark.parametrize("value,encoded", KNOWN)
def test_vint_known_patterns(value, encoded):
    assert HKV.encode_vint(value) == encoded
    got, pos = HKV.decode_vint(encoded, 0)
    assert got == value and pos == len(encoded)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_vint_roundtrip_property(v):
    enc = HKV.encode_vint(v)
    got, pos = HKV.decode_vint(enc, 0)
    assert got == v and pos == len(enc)


def test_kv_records_roundtrip():
    pairs = [(b"k1", b"v1"), (b"", b"empty-key"), (b"k3" * 100, b"")]
    blob = HKV.encode_kv_records(pairs)
    assert list(HKV.decode_kv_stream(blob)) == pairs


def test_kv_stream_truncation_raises():
    blob = HKV.encode_kv_records([(b"key", b"value")])
    with pytest.raises(ValueError):
        list(HKV.decode_kv_stream(blob[:-2]))


def test_kv_eof_marker_stops():
    blob = HKV.encode_kv_records([(b"a", b"b")]) + HKV.encode_vint(-1) + b"junk"
    assert list(HKV.decode_kv_stream(blob)) == [(b"a", b"b")]


def test_kv_stream_spark_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    path = str(tmp_path / "kvstream")
    n_files = HKV.write_kv_stream(src, path, "n_nationkey", "n_name")
    assert n_files >= 1
    back = HKV.read_kv_stream(spark, path)
    got = sorted(
        (bytes(r["key"]).decode(), bytes(r["value"]).decode()) for r in back.collect()
    )
    want = sorted((str(r["n_nationkey"]), r["n_name"]) for r in src.collect())
    assert got == want


def test_sequence_file_spark_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    path = str(tmp_path / "seqfile")
    HKV.write_sequence_file(src, path, "n_nationkey", "n_name")
    back = HKV.read_sequence_file(spark, path, "n_nationkey long, n_name string")
    got = sorted((r["n_nationkey"], r["n_name"]) for r in back.collect())
    want = sorted((r["n_nationkey"], r["n_name"]) for r in src.collect())
    assert got == want
