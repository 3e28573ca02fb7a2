"""Plan module streaming_batch — populated incrementally (see SURVEY.md §2)."""

QUERIES: dict = {}
ORACLES: dict = {}
