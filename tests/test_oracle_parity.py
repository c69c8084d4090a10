"""Oracle-parity harness — the local twin of the driver's t2 gate.

For every registered query with an oracle, run the Spark DataFrame and the
DuckDB SQL on the same parquet tables and compare row sets exactly
(sorted by all columns, column order normalized).  Exact comparison, not
approximate: the queries are designed to be engine-exact (see
functions/portable.py and queries/common.py), and this test is what
enforces that design holds.
"""

from __future__ import annotations

import math

import pytest

from uda_spark.cache import release_persisted
from uda_spark.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


def _normalize(value):
    # Tag every value with a None-rank so sorting is total even when a
    # column mixes NULL and non-NULL (sorted() on bare None raises
    # TypeError instead of reporting a clean mismatch).
    if value is None:
        return (0, "")
    if isinstance(value, float):
        if math.isnan(value):
            return (1, "NaN")
        # collapse -0.0 / 0.0 and format deterministically
        return (1, repr(value + 0.0))
    if isinstance(value, bytes):
        return (1, value.hex())
    return (1, value)


def _rows_to_set(columns, rows):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_normalize(row[i]) for i in idx))
    return sorted(out)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, duck_smoke):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMOKE)
    s_cols = [c.lower() for c in sdf.columns]
    try:
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        release_persisted()  # drop tracked intermediates (minhash/simhash)

    rel = duck_smoke.sql(spec.oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    s_set = _rows_to_set(s_cols, s_rows)
    d_set = _rows_to_set(d_cols, d_rows)
    assert len(s_set) == len(d_set), (
        f"{name}: row count spark={len(s_set)} duck={len(d_set)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_driver_window_is_rotation_3():
    """The external driver samples the first 50 exported queries; from
    round 8 the window is "never-driver-sampled first (`_R08_UNSAMPLED`,
    the 7 round-7 registrations that landed after slot 50), then this
    round's registrations (`_R08_NEW`), then registration order".  Pin
    the ordering so a refactor can't silently reshuffle it before the
    driver runs, and check nothing was lost: the export is still all
    registered queries exactly once."""
    from uda_spark.registry import _R08_NEW, _R08_UNSAMPLED, get_queries

    names = list(get_queries())
    assert len(_R08_UNSAMPLED) == 7
    head = _R08_UNSAMPLED + _R08_NEW
    assert tuple(names[: len(head)]) == head
    assert len(names) == len(set(names)) == len(SPECS)
