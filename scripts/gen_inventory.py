"""Round-close inventory generator (VERDICT r07 'Next' #3 + #4).

Hand-maintained counts drift every round (SURVEY.md said "203" while the
registry held 204). This script is the single source of truth:

  * prints the registry size and per-family counts to paste into
    SURVEY.md / README.md at round close, and
  * emits the staleness-ordered ``_VERIFIED_TAIL`` tuple body for
    ``go_fish_spark/queries/__init__.py`` — entries sorted by the round
    of their most recent driver hash-verification (stalest first), so
    the driver's 50-entry CORRECTNESS window always re-checks what has
    gone longest without a driver look.

Run from the repo root:  python scripts/gen_inventory.py [--tail]
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")

from go_fish_spark.queries import REGISTRY, resolve_oracle  # noqa: E402


def last_verified() -> dict[str, int]:
    """name -> latest driver round whose CORRECTNESS file recorded the
    entry green. An entry counts as verified ONLY on hash_match; the
    rows-only fallback applies only when the record carries no hash
    verdict at all (a genuinely oracle-less entry) — a recorded
    hash_match=false is a live regression and must NOT rotate the entry
    to the stale end of the driver window."""
    out: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for k, v in json.load(open(f)).items():
            hm = v.get("hash_match")
            green = hm is True or (
                hm is None and v.get("rows_match") and v.get("err") is None
            )
            if green:
                out[k] = max(out.get(k, 0), rnd)
    return out


def counts() -> dict[str, int]:
    fam: dict[str, int] = {}
    for n in REGISTRY:
        fam[n[0]] = fam.get(n[0], 0) + 1
    no_oracle = [n for n, qd in REGISTRY.items() if qd.oracle is None]
    return {
        "total": len(REGISTRY),
        "q_series": fam.get("q", 0),
        "x_series": fam.get("x", 0),
        "without_oracle": len(no_oracle),
    }


#: the q-series is COMPLETE and FROZEN (SURVEY §2.7 growth policy, r13):
#: it covers every reference behavior, the §2.6 gap list, and all 22
#: TPC-H shapes. New coverage goes to the x-series, gated on "new
#: operator family or new scale law" — never a variation of an
#: existing entry.
Q_SERIES_FROZEN_AT = 96


def main() -> None:
    c = counts()
    print(
        f"registry: {c['total']} entries "
        f"({c['q_series']} q-series, {c['x_series']} x-series); "
        f"{c['total'] - c['without_oracle']} with DuckDB hash oracles, "
        f"{c['without_oracle']} rows-only"
    )
    if c["q_series"] != Q_SERIES_FROZEN_AT:
        print(
            f"ERROR: q-series is frozen at {Q_SERIES_FROZEN_AT} entries "
            f"(SURVEY §2.7 growth policy) but the registry has "
            f"{c['q_series']} — new coverage belongs in the x-series "
            "(and only for a new operator family or scale law)"
        )
        sys.exit(1)
    lv = last_verified()
    never = [n for n in REGISTRY if n not in lv]
    if never:
        print(f"never driver-verified ({len(never)}): {never}")
    if "--tail" in sys.argv:
        reg = list(REGISTRY)
        order = sorted(reg, key=lambda n: (lv.get(n, 0), reg.index(n)))
        cur = None
        for n in order:
            r = lv.get(n, 0)
            if r != cur:
                print(f"    # last driver-verified in CORRECTNESS_r{r:02d}")
                cur = r
            print(f'    "{n}",')
    # smoke: every oracle resolves (callable oracles fit on DRIVER_SF_DIR)
    bad = [n for n, qd in REGISTRY.items()
           if qd.oracle is not None and not resolve_oracle(qd)]
    if bad:
        print(f"WARNING: oracles resolving to empty: {bad}")


if __name__ == "__main__":
    main()
