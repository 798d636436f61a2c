from radar_output_restructure_spark.functions.timeutil import event_time  # noqa: F401
from radar_output_restructure_spark.functions.sanitize import sanitize_id  # noqa: F401
from radar_output_restructure_spark.functions.javafmt import (  # noqa: F401
    base64_no_pad,
    java_number_repr,
)
from radar_output_restructure_spark.functions.flatten import flatten  # noqa: F401
