"""Mechanically compose the next round's _VERIFY_FIRST fill list.

The window recipe (queries/__init__.py) is: never-checked queries
LEAD, then this round's plan-change re-checks, then a FILL of the
oldest-green ORACLE-BACKED queries in CORRECTNESS-file order until
the window holds 50 names. This script computes the fill candidates
from the committed CORRECTNESS history so composing a round's window
is a copy-paste, not an audit:

    python tools/compose_window.py [n_new_and_changed]

prints (a) any oracle-backed query whose newest green row would
EXPIRE under the derived horizon if left out of the upcoming window,
and (b) the oldest-green fill ordering to draw the remaining slots
from. Rows-only queries are exempt from the horizon once they hold
a first driver row (the r9 verdict rule) and are listed separately.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def newest_green() -> tuple[dict[str, int], int]:
    newest: dict[str, int] = {}
    max_round = 0
    names = sorted(
        f for f in os.listdir(REPO)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    for fname in names:
        rnd = int(re.search(r"r(\d+)", fname).group(1))
        max_round = max(max_round, rnd)
        with open(os.path.join(REPO, fname)) as f:
            for name, row in json.load(f).items():
                green = row.get("hash_match") is True or (
                    row.get("err") == "no_oracle"
                )
                if green:
                    newest[name] = max(newest.get(name, 0), rnd)
    return newest, max_round


def main() -> None:
    from cdc_2025_spark.queries import ORACLES, QUERIES

    n_front = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    newest, max_round = newest_green()
    upcoming = max_round + 1
    horizon = max(2, -(-len(QUERIES) // WINDOW))
    n_fill = WINDOW - n_front

    never = [n for n in QUERIES if n not in newest]
    print(f"# upcoming round r{upcoming}; registry {len(QUERIES)}; "
          f"horizon {horizon}; window {WINDOW}")
    print(f"# never-checked (MUST lead): {len(never)}")
    for n in never:
        print(f"#   {n}")

    oracle_backed = [n for n in QUERIES if n in ORACLES and n in newest]
    expiring = [
        n for n in oracle_backed
        if newest[n] < upcoming + 1 - horizon
    ]
    print(f"# would be stale after r{upcoming} if left out: "
          f"{len(expiring)}")
    # fill order: oldest green first, CORRECTNESS-file (=insertion
    # within a round) order approximated by registry order within
    # equal rounds — matches the committed window comments' rule
    fill = sorted(oracle_backed, key=lambda n: (newest[n],
                                                list(QUERIES).index(n)))
    print(f"# oldest-green fill order (take the first {n_fill} "
          f"after the leads/changed):")
    for n in fill[: max(n_fill, 0) + 10]:
        print(f'    "{n}",  # green r{newest[n]}')


if __name__ == "__main__":
    main()
