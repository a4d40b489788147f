"""``python -m deep_field_spark`` — the scrape-ETL CLI (SURVEY §3.1)."""

import sys

from .scraping.cli import main

if __name__ == "__main__":
    sys.exit(main())
