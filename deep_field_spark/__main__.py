"""``python -m deep_field_spark`` — the scrape-ETL CLI (SURVEY §3.1)."""

import sys

from .scraping.cli import main

sys.exit(main())
