"""Property-based differential test: random adversarial games through
the Spark appearance windows vs the literal reference-code simulation.

SURVEY §7's risk register: "write the window version property-tested
against a literal Python re-simulation" — the fixtures exercise two
same-name scenarios; hypothesis generates hundreds of hostile ones
(colliding stripped names, Jr./Sr. titles, middle initials, raw-name
vs presentation-name play rows, pitchers alternating mid-inning).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deep_field_spark.scraping import pipeline as P
from tests.ref_simulator import roster_name_nids, simulate

# Name pool engineered for collisions: stripped forms overlap across
# Jr./Sr. titles and middle initials.
NAME_POOL = [
    "Ken Griffey",
    "Ken Griffey Jr.",
    "Roberto Hernandez",
    "Bob A. Smith",
    "Bob Smith",
    "Jim Kelly",
]


@st.composite
def games(draw):
    rng = draw(st.randoms(use_true_random=False))
    rosters = []
    for side in ("away", "home"):
        n = draw(st.integers(min_value=2, max_value=5))
        names = [rng.choice(NAME_POOL) for _ in range(n)]
        for pos, name in enumerate(names):
            rosters.append(
                {
                    "side": side,
                    "pos": pos,
                    "name_raw": name,
                    "name_id": f"{side[0]}{pos:02d}id",
                }
            )
    # presentation names per side (what play rows show)
    present = {}
    raws = {}
    for side in ("away", "home"):
        rows = [r for r in rosters if r["side"] == side]
        present[side] = [n for n, _ in roster_name_nids(rows)]
        raws[side] = [r["name_raw"] for r in rows]
    n_plays = draw(st.integers(min_value=3, max_value=25))
    plays = []
    for i in range(n_plays):
        inning = rng.choice(["t1", "b1", "t2", "b2", "t3"])
        b_side = "away" if inning[0] == "t" else "home"
        p_side = "home" if inning[0] == "t" else "away"
        # mostly presentation names; sometimes the raw (unstripped)
        # form to exercise the stripped-name fallback path
        def pick(side):
            pool = present[side] if rng.random() < 0.8 else raws[side]
            return rng.choice(pool)

        plays.append(
            {
                "play_num": i,
                "inning": inning,
                "outs": "0",
                "pitches": "",
                "desc": f"play {i}",
                "runners": "---",
                "batter": pick(b_side),
                "pitcher": pick(p_side),
            }
        )
    return {"rosters": rosters, "plays": plays}


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(game=games())
@pytest.mark.slow
def test_windows_match_reference_simulation(spark, game):
    expected = simulate(game)

    parsed = spark.createDataFrame(
        [("G000000000", None, game["rosters"], game["plays"], None)],
        P.GAME_PARSED_SCHEMA,
    )
    players = P.mock_players_from_games(parsed)
    nid_of = {r.id: r.name_id for r in players.collect()}
    got = {
        r.play_num: (nid_of[r.batter_id], nid_of[r.pitcher_id])
        for r in P.resolve_plays(parsed, players).collect()
    }
    assert len(got) == len(expected)
    mismatches = {
        n: (got[n], exp) for n, exp in enumerate(expected) if got[n] != exp
    }
    assert not mismatches, mismatches
