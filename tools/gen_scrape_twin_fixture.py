"""Generate deep_field_spark/queries/scrape_twin_data.py.

Parses the reference's fixture game pages (pure-Python parse, no Spark)
and emits the rosters/plays/players literals that back the
``scrape_core_resolved_plays`` oracle twin: the SAME parsed rows feed
the Spark ``resolve_plays`` build AND the DuckDB VALUES replay, so the
reference's hardest semantics (appearance windows W1-W4, id cycling,
roster disambiguation — bbref_pages.py:676-761) get a driver
hash-green row instead of a permanent no_oracle slot.

Checked-in output is guarded by tests/test_scrape_pipeline.py
(test_twin_literals_match_fresh_parse): regenerate with

    python tools/gen_scrape_twin_fixture.py
"""

from __future__ import annotations

import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_field_spark.scraping import parse  # noqa: E402

FIXTURES = "/root/reference/tests/scraping/resources"
# the semantically hard fixtures (same set as scrape_star_plays):
# golden game + same-name pitcher + father/son batters
GAMES = ["WAS201710120", "BAL200705070", "SEA199105260"]

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "deep_field_spark", "queries", "scrape_twin_data.py",
)


def build() -> tuple[list, list, list]:
    rosters, plays = [], []
    for nid in GAMES:
        with open(f"{FIXTURES}/GamePage/{nid}.shtml", encoding="utf-8") as f:
            g = parse.parse_game(f.read())
        for r in g["rosters"]:
            rosters.append((nid, r["side"], r["pos"], r["name_raw"], r["name_id"]))
        for p in g["plays"]:
            plays.append(
                (nid, p["play_num"], p["inning"], p["outs"], p["pitches"],
                 p["desc"], p["runners"], p["batter"], p["pitcher"])
            )
    # deterministic surrogate ids: 1..N over sorted distinct name_ids
    # (stands in for the J4 dim upsert, which is oracle-checked
    # separately; the twin pins J1/J2/J5 + W1-W4)
    name_ids = sorted({r[4] for r in rosters})
    players = [(i + 1, nid) for i, nid in enumerate(name_ids)]
    return rosters, plays, players


def main() -> None:
    rosters, plays, players = build()
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(
            '"""Parsed-fixture literals for the scrape-core oracle twin.\n\n'
            "GENERATED — do not edit by hand; regenerate with\n"
            "    python tools/gen_scrape_twin_fixture.py\n"
            "The generator parses the reference fixture game pages with the\n"
            "production parser; tests/test_scrape_pipeline.py asserts the\n"
            "checked-in literals match a fresh parse (drift guard).\n"
            '"""\n\n'
            "# fmt: off\n"
            f"GAMES = {pprint.pformat(GAMES, width=76)}\n\n"
            "# (game_name_id, side, pos, name_raw, name_id)\n"
            f"ROSTERS = {pprint.pformat(rosters, width=76)}\n\n"
            "# (game_name_id, play_num, inning, outs, pitches, desc, runners,\n"
            "#  batter, pitcher)\n"
            f"PLAYS = {pprint.pformat(plays, width=76)}\n\n"
            "# (player_id, name_id) — 1..N over sorted distinct roster name_ids\n"
            f"PLAYERS = {pprint.pformat(players, width=76)}\n"
            "# fmt: on\n"
        )
    print(f"wrote {OUT}: {len(rosters)} roster rows, {len(plays)} plays, "
          f"{len(players)} players")


if __name__ == "__main__":
    main()
