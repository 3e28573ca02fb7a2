"""Plan module api — populated incrementally (see SURVEY.md §2)."""

QUERIES: dict = {}
ORACLES: dict = {}
