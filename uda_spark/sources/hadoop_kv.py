"""Hadoop KV ingestion: SequenceFiles and VInt-framed KV byte streams.

The reference's actual input is Hadoop map-output segments: records
framed as ``[vint key_len][vint val_len][key bytes][val bytes]``
(reader ``BaseSegment::nextKVInternal``, src/Merger/StreamRW.cc:334-404;
vint codec src/CommUtils/IOUtility.cc:287-333 — the C++ twin of Hadoop's
``WritableUtils.readVInt``).  A user migrating real Hadoop data needs
both entry points:

* **SequenceFile** — the standard Hadoop container.  Spark reads/writes
  it natively (``sc.sequenceFile`` / ``saveAsSequenceFile`` with
  automatic Writable conversion), so these wrappers only pin the
  DataFrame <-> (key, value) mapping from SURVEY §1.5.
* **Raw VInt-framed stream** — the MOF segment layout itself.  The codec
  here implements the *public* Hadoop VInt wire format byte-for-byte,
  and the reader parses whole files per partition (``binaryFiles`` +
  a generator — genuinely imperative byte work, the documented
  mapPartitions exception).  Ingestion-side only: once parsed, rows are
  normal DataFrame rows and everything downstream is JVM-side.

Scale notes: ``binaryFiles`` yields one partition per file (matching the
one-MOF-per-map layout); decoding streams through a generator without
materializing the record list.  The writer targets a shared POSIX path
(one framed blob per partition) — at scale the SequenceFile container is
the durable interchange, and the raw framing is primarily a *reader* for
data that already exists.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# Hadoop VInt wire format (WritableUtils.writeVInt — public spec):
#   first byte b:
#     -112 <= b <= 127 : the value itself
#     -120 <= b < -112 : positive value, big-endian, length = -(b + 112)
#     -128 <= b < -120 : negative value, big-endian, length = -(b + 120),
#                        stored as the complement (~v)


def encode_vint(v: int) -> bytes:
    if -112 <= v <= 127:
        return bytes([v & 0xFF])
    neg = v < 0
    if neg:
        v = ~v
    length = (v.bit_length() + 7) // 8
    first = (-120 if neg else -112) - length
    return bytes([first & 0xFF]) + v.to_bytes(length, "big")


def decode_vint(buf: bytes, pos: int) -> Tuple[int, int]:
    """(value, next_pos); raises on truncation."""
    b = buf[pos]
    if b >= 0x80:
        b -= 0x100  # to signed
    if b >= -112:
        return b, pos + 1
    neg = b < -120
    length = -(b + (120 if neg else 112))
    end = pos + 1 + length
    if end > len(buf):
        raise ValueError(f"truncated vint at {pos}")
    v = int.from_bytes(buf[pos + 1 : end], "big")
    return (~v if neg else v), end


def encode_kv_records(pairs: Iterable[Tuple[bytes, bytes]]) -> bytes:
    """Frame (key, value) byte pairs the way a map-output segment does:
    ``[vint klen][vint vlen][key][value]`` — both lengths lead, as in
    Hadoop's IFile record layout."""
    out = bytearray()
    for k, v in pairs:
        out += encode_vint(len(k))
        out += encode_vint(len(v))
        out += k
        out += v
    return bytes(out)


def decode_kv_stream(data: bytes) -> Iterator[Tuple[bytes, bytes]]:
    """Stream (key, value) pairs out of a framed blob.

    A negative key length marks EOF (Hadoop IFile convention); anything
    else malformed raises rather than silently truncating.
    """
    pos, n = 0, len(data)
    while pos < n:
        klen, pos = decode_vint(data, pos)
        if klen < 0:
            return  # EOF marker
        vlen, pos = decode_vint(data, pos)
        end_k = pos + klen
        end_v = end_k + vlen
        if end_v > n:
            raise ValueError(f"truncated record at {pos}")
        yield data[pos:end_k], data[end_k:end_v]
        pos = end_v


# ---------------------------------------------------------------------------
# Spark integration


def write_kv_stream(df: DataFrame, path: str, key_col: str, val_col: str) -> int:
    """Write (key, value) string/binary columns as one VInt-framed blob per
    partition under ``path``; returns the number of files written.
    POSIX-shared-path writer (local/NFS); durable interchange at scale is
    the SequenceFile container below."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)  # stale part files would double-count
    os.makedirs(path, exist_ok=True)

    def _to_bytes(x) -> bytes:
        if isinstance(x, (bytes, bytearray)):
            return bytes(x)
        return str(x).encode("utf-8")

    def write_part(idx: int, rows) -> Iterator[int]:
        blob = encode_kv_records(
            (_to_bytes(r[0]), _to_bytes(r[1])) for r in rows
        )
        with open(os.path.join(path, f"part-{idx:05d}.kv"), "wb") as f:
            f.write(blob)
        yield 1

    return (
        df.select(key_col, val_col)
        .rdd.mapPartitionsWithIndex(write_part)
        .sum()
    )


def read_kv_stream(spark: SparkSession, path: str) -> DataFrame:
    """Parse VInt-framed KV files into a (key binary, value binary)
    DataFrame — SURVEY §1.5's mapping for opaque KV record streams."""
    files = spark.sparkContext.binaryFiles(os.path.join(path, "*.kv"))
    pairs = files.flatMap(lambda kv: decode_kv_stream(kv[1]))
    return spark.createDataFrame(pairs, "key binary, value binary")


def write_sequence_file(df: DataFrame, path: str, key_col: str, val_col: str) -> None:
    """(key, value) columns -> Hadoop SequenceFile via Spark's native
    Writable conversion (int -> IntWritable/LongWritable, str -> Text,
    bytearray -> BytesWritable).  Overwrites ``path``."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)  # saveAsSequenceFile refuses to overwrite
    df.select(key_col, val_col).rdd.map(tuple).saveAsSequenceFile(path)


def read_sequence_file(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """SequenceFile -> DataFrame with the given two-column schema string
    (e.g. ``"event_id long, payload string"``)."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, schema)
