"""Literal Python re-simulation of the reference's play-resolution
semantics (bbref_pages.py: roster naming 282-297, _PlayerAppearances
706-761, id cycling 689-695) — the differential oracle for the Spark
window formulation in scraping/pipeline.py.

Note: the reference's own BAL/SEA golden lists (test_pages.py:224-253)
are vacuous — ``Play.get(X and Y)`` collapses to the last operand under
Python ``and`` on peewee expressions — so the reference CODE, re-run
here faithfully, is the authoritative spec.
"""

from __future__ import annotations

import re

SIDE = {
    ("t", "batter"): "away",
    ("b", "batter"): "home",
    ("t", "pitcher"): "home",
    ("b", "pitcher"): "away",
}


def strip_name(name: str) -> str:
    return re.sub(r" [J|S]r\.", "", re.sub(r" \w\.", "", name))


def roster_name_nids(rows: list[dict]) -> list[tuple[str, str]]:
    """(presented name, name_id) per roster row: stripped unless two
    rows share a stripped name (father/son duos keep full names)."""
    name_to_inds: dict[str, int] = {}
    n_nids: list[tuple[str, str]] = []
    for i, r in enumerate(rows):
        name = strip_name(r["name_raw"])
        if name in name_to_inds:
            j = name_to_inds[name]
            n_nids[j] = (rows[j]["name_raw"], n_nids[j][1])
            name = r["name_raw"]
        n_nids.append((name, r["name_id"]))
        name_to_inds[name] = i
    return n_nids


def simulate(parsed_game: dict) -> list[tuple[str, str]]:
    """Per play (batter_name_id, pitcher_name_id) under reference
    semantics."""
    tables: dict[str, dict[str, list[str]]] = {}
    for side in ("away", "home"):
        rows = [r for r in parsed_game["rosters"] if r["side"] == side]
        ids: dict[str, list[str]] = {}
        for n, nid in roster_name_nids(rows):
            ids.setdefault(n, []).append(nid)
        tables[side] = ids

    apps = {
        s: {n: {"batter": 0, "pitcher": 0} for n in tables[s]} for s in tables
    }

    def inc(inning: str, ptype: str, name: str) -> None:
        side = SIDE[(inning[0], ptype)]
        key = name if name in apps[side] else strip_name(name)
        apps[side][key][ptype] += 1

    def lookup(name: str, ih_char: str, ptype: str) -> str:
        side = SIDE[(ih_char, ptype)]
        key = name if name in apps[side] else strip_name(name)
        appear = apps[side][key][ptype]
        ids = tables[side][key]
        return ids[appear % len(ids)]

    out: list[tuple[str, str]] = []
    prev = None
    for p in parsed_game["plays"]:
        if prev is not None:
            inc(prev["inning"], "batter", prev["batter"])
            if prev["pitcher"] != p["pitcher"]:
                inc(prev["inning"], "pitcher", prev["pitcher"])
        out.append(
            (
                lookup(p["batter"], p["inning"][0], "batter"),
                lookup(p["pitcher"], p["inning"][0], "pitcher"),
            )
        )
        prev = p
    return out
