"""Driver-window freshness rotation (round 9+ contract).

The external correctness driver samples the FIRST 50 queries exported by
``uda_spark.registry.all_specs()``.  Through round 8 the window was
"never-sampled first, then new-this-round, then registration order" —
which completed cumulative coverage (284/284 by CORRECTNESS_r08) but
would re-sample the same head forever afterward, letting old queries'
external rows go permanently stale (28 names' only row dated to round 1
at round-8 close).

From round 9 the window is **least-recently-sampled (LRS)**: new
registrations first (they earn a driver row the round they ship), then
every other query ordered by the round of its latest external
CORRECTNESS row, oldest first, ties broken by registration order.  The
ordering is a pure function of the committed ``CORRECTNESS_r0*.json``
KEY SETS (which queries the driver sampled — never pass/fail outcomes)
plus the registration order in this package, so it is reproducible from
the repo alone.  Maximum staleness is bounded: with N registered queries
and a 50-slot window, every query is re-sampled at least once every
``ceil(N / (50 - new_per_round))`` rounds (~6 at N=284, zero growth).

Each round: run this module as a script, paste the emitted tuple over
``_LRS_ORDER`` in ``uda_spark/registry.py``, bump ``LRS_THROUGH_ROUND``,
and reset ``_NEW_THIS_ROUND`` and ``_REPROVEN_THIS_ROUND`` to empty
(appending names as they land; a REPROVEN name is one whose semantics
and oracle were replaced mid-life — it must re-earn a driver row the
round it changes, so it sorts right after the new names).
``tests/test_oracle_parity.py::test_driver_window_is_lrs_rotation``
recomputes the ordering from the committed files and fails if the frozen
tuple drifts.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Tuple

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_sampled_rounds(
    through_round: int, repo_root: str = REPO_ROOT
) -> Dict[str, int]:
    """Map query name -> latest round (1-based) whose committed
    ``CORRECTNESS_r{NN}.json`` contains it as a key, considering rounds
    1..through_round only.  Never-sampled names are absent (treated as
    round 0 by the ordering)."""
    last: Dict[str, int] = {}
    for r in range(1, through_round + 1):
        path = os.path.join(repo_root, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            for name in json.load(fh):
                last[name] = r
    return last


def compute_lrs_order(
    through_round: int,
    exclude: Iterable[str] = (),
    repo_root: str = REPO_ROOT,
) -> Tuple[str, ...]:
    """All registered names except ``exclude``, ordered oldest-external-
    row first (never-sampled = round 0), ties in registration order
    (stable sort over the registration sequence)."""
    from uda_spark.registry import registration_order

    last = last_sampled_rounds(through_round, repo_root)
    skip = set(exclude)
    names = [n for n in registration_order() if n not in skip]
    return tuple(sorted(names, key=lambda n: last.get(n, 0)))


def main() -> None:
    import sys

    sys.path.insert(0, REPO_ROOT)
    from uda_spark.registry import (
        LRS_THROUGH_ROUND,
        _NEW_THIS_ROUND,
        _REPROVEN_THIS_ROUND,
    )

    through = int(sys.argv[1]) if len(sys.argv) > 1 else LRS_THROUGH_ROUND
    exclude = _NEW_THIS_ROUND + _REPROVEN_THIS_ROUND
    order = compute_lrs_order(through, exclude=exclude)
    last = last_sampled_rounds(through)
    print(f"# LRS order through round {through} "
          f"({len(order)} names, excluding {len(exclude)} new/reproven)")
    print(f"# head-50 last-sampled rounds: "
          f"{[last.get(n, 0) for n in order[:50]]}")
    print("_LRS_ORDER: tuple[str, ...] = (")
    for n in order:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
