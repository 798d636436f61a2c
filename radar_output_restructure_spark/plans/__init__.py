from radar_output_restructure_spark.plans.path_format import (  # noqa: F401
    BucketFormat,
    PathFormat,
)
from radar_output_restructure_spark.plans.restructure import RestructurePlan  # noqa: F401
