from radar_output_restructure_spark.plans.path_format import PathFormat  # noqa: F401
from radar_output_restructure_spark.plans.restructure import RestructurePlan  # noqa: F401
