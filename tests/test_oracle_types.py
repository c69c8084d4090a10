"""Pin the DuckDB result types of every registered oracle.

Round-2 root cause: the only two driver hash-fails were the only two oracles
whose DuckDB result contained a HUGEINT (int128) column — DuckDB widens
integer aggregates (SUM, list_sum, integer //) to HUGEINT unless cast, and
an int128 column serializes differently from int64 in the external hasher
even when the values are numerically identical.  This sweep asserts every
oracle's result schema stays inside the hasher-safe type set, so a future
query can't reintroduce the bug.  Uses DESCRIBE (type inference only), so
the whole registry sweeps in seconds.
"""

from __future__ import annotations

import pytest

from uda_spark.registry import all_specs

# Types proven hasher-stable by two rounds of driver comparisons.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN"}

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_result_types_are_hasher_safe(name, duck_smoke):
    rel = duck_smoke.sql(f"DESCRIBE {SPECS[name].oracle}")
    offending = [
        (col, typ)
        for col, typ, *_ in rel.fetchall()
        if typ not in ALLOWED_TYPES
    ]
    assert not offending, (
        f"{name}: oracle columns outside the hasher-safe type set "
        f"{sorted(ALLOWED_TYPES)}: {offending} — cast them (HUGEINT from "
        f"SUM/list_sum//: use CAST(... AS BIGINT))"
    )
