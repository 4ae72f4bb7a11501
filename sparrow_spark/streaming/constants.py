"""Session-gap / watermark constants shared by the streaming operators,
their batch twins, and every oracle that re-derives the same sessions in
SQL. These thresholds appear in four places that MUST agree (streaming
plan, batch plan, Spark-side comparison, DuckDB oracle) — a tweak to a
duplicated literal desynchronizes engine and oracle silently, so all of
them interpolate from here.
"""

# Inactivity gap that closes a session (F.session_window gap duration).
SESSION_GAP_SECONDS = 1800
SESSION_GAP_US = SESSION_GAP_SECONDS * 1_000_000
SESSION_GAP_INTERVAL = f"{SESSION_GAP_SECONDS // 60} minutes"

# Late-data watermark for every streaming operator on the events stream.
WATERMARK_SECONDS = 7200
WATERMARK_MS = WATERMARK_SECONDS * 1000
WATERMARK_INTERVAL = f"{WATERMARK_SECONDS // 3600} hours"

# Stream-stream join attribution lookback (click -> purchase).
ATTRIBUTION_SECONDS = 3600
ATTRIBUTION_INTERVAL = f"{ATTRIBUTION_SECONDS // 3600} hour"
