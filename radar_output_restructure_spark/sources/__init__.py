from radar_output_restructure_spark.sources.kafka_tree import (  # noqa: F401
    parse_offset_filename,
    read_topic_tree,
    with_file_metadata,
)
from radar_output_restructure_spark.sources.manifest import ProcessedFileManifest  # noqa: F401
