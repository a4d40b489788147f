"""The driver canonicalizes results with pandas ``sort_values`` over all
columns, which cannot hash list cells — round 3's only driver-red
(`embedding_quantize_int8`, ``TypeError: unhashable type: 'list'``) was
an array output column that the local harness's tuple-izing comparator
happily accepted. These tests pin the local probes to the driver's real
behavior so an array-typed output fails HERE first.
"""

from __future__ import annotations

import datetime

import pytest

from tests.oracle_utils import driver_canon_check


def test_probe_raises_on_list_cells_like_driver():
    with pytest.raises(TypeError, match="unhashable"):
        driver_canon_check(["a", "q"], [(1, [1, 2]), (2, [3, 4])])


def test_probe_accepts_scalar_and_serialized_forms():
    driver_canon_check(
        ["a", "q", "t"],
        [
            (1, "[1,2]", datetime.datetime(2024, 1, 1)),
            (2, None, datetime.datetime(2024, 1, 2)),
        ],
    )
    driver_canon_check(["a"], [])


def test_driver_sim_probe_matches():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.driver_sim import driver_canon_probe

    # pandas only hash-factorizes on MULTI-column lexsort (the driver's
    # real shape: every query returns >1 column); single-column sorts
    # take the comparison-based nargsort path and pass
    with pytest.raises(TypeError, match="unhashable"):
        driver_canon_probe(["a", "q"], [(1, [1, 2]), (2, [3, 4])])
    driver_canon_probe(["a", "q"], [(1, "[1,2]"), (2, "[3,4]")])
