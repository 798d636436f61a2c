from radar_output_restructure_spark.operators.dedup import (  # noqa: F401
    dedup_keep_first,
    dedup_keep_last,
)
from radar_output_restructure_spark.operators.timebin import time_bin  # noqa: F401
