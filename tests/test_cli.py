"""CLI parity tests (SURVEY §3.1): arg validation pure-Python, plus one
end-to-end run over the reference fixture cache through the session the
suite already holds (main() builds its own session, so the e2e path
drives orchestrate directly with the CLI's parsed/validated values).
"""

from __future__ import annotations

import datetime
import sqlite3

import pytest

from deep_field_spark.scraping import cli

FIXTURES = "/root/reference/tests/scraping/resources"


class TestArgValidation:
    def test_year_bounds(self):
        assert cli.validate_years(2017, None) == (2017, 2017)
        assert cli.validate_years(1990, 2000) == (1990, 2000)
        for bad in [(1870, None), (1919, None), (2017, 2016), (1999, 3000)]:
            with pytest.raises(ValueError):
                cli.validate_years(*bad)

    def test_min_year_matches_reference(self):
        # /root/reference/deepfield/scraper.py:11 EARLIEST_YEAR = 1920
        assert cli.MIN_YEAR == 1920
        assert cli.validate_years(1920, None) == (1920, 1920)

    def test_year_upper_bound_is_current_year(self):
        y = datetime.date.today().year
        assert cli.validate_years(y, None) == (y, y)
        with pytest.raises(ValueError):
            cli.validate_years(y + 1, None)

    def test_db_name_sanitized(self):
        assert cli.sanitize_db_name("stats") == "stats.db"
        assert cli.sanitize_db_name("/tmp/../etc/stats.db") == "stats.db"
        with pytest.raises(ValueError):
            cli.sanitize_db_name("  ")

    def test_crawl_delay_clamped(self, capsys):
        assert cli.clamp_crawl_delay(0.5) == cli.MIN_CRAWL_DELAY
        assert "clamping" in capsys.readouterr().err
        assert cli.clamp_crawl_delay(5.0) == 5.0

    def test_parse_args_defaults(self):
        a = cli.parse_args(["2017"])
        assert (a.start_year, a.end_year) == (2017, None)
        assert a.crawl_delay == cli.MIN_CRAWL_DELAY

    def test_main_rejects_bad_years(self):
        assert cli.main(["1870"]) == 2

    def test_main_traps_keyboard_interrupt(self, monkeypatch, capsys):
        """E5: ^C mid-scrape exits cleanly with the reference's
        'Ending scrape' message (scraper.py:50-54) instead of a
        traceback; resume works by rerunning (idempotent upserts)."""
        import deep_field_spark.session as sess
        import deep_field_spark.scraping.orchestrate as orch

        class _FakeSpark:
            def stop(self):
                pass

        def _boom(*a, **k):
            raise KeyboardInterrupt

        monkeypatch.setattr(sess, "get_spark", lambda *a, **k: _FakeSpark())
        monkeypatch.setattr(orch, "scrape_from_cache", _boom)
        assert cli.main(["2017"]) == 130
        assert "Ending scrape" in capsys.readouterr().err


@pytest.mark.slow
def test_cli_year_scoped_run(spark, tmp_path):
    """The CLI's orchestration path: fixture cache → year filter →
    star → SQLite, with the 2017 filter excluding other years' games."""
    from deep_field_spark.scraping.orchestrate import scrape_from_cache

    db = tmp_path / cli.sanitize_db_name("cli_run")
    star, counters = scrape_from_cache(
        spark,
        FIXTURES,
        db_path=str(db),
        year_range=cli.validate_years(2017, None),
    )
    games = [r.name_id for r in star["game"].select("name_id").collect()]
    assert games and all(g[3:7] == "2017" for g in games)
    assert counters["plays"] > 0
    con = sqlite3.connect(db)
    n_db_games = con.execute("SELECT count(*) FROM game").fetchone()[0]
    n_db_plays = con.execute("SELECT count(*) FROM play").fetchone()[0]
    con.close()
    assert n_db_games == len(games)
    assert n_db_plays == counters["plays"]
