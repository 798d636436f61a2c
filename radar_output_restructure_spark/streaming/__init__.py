"""Streaming surface (SURVEY §2.10 ST1-ST5)."""

from radar_output_restructure_spark.streaming.service import run_service  # noqa: F401
from radar_output_restructure_spark.streaming.stream_restructure import (  # noqa: F401
    streaming_restructure,
)
from radar_output_restructure_spark.streaming.windows import (  # noqa: F401
    hourly_event_counts,
    session_windows,
)
