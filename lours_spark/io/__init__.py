from lours_spark.io.coco import dataset_to_coco, from_coco
from lours_spark.io.darknet import dataset_to_darknet, from_darknet
from lours_spark.io.folder import from_folder
from lours_spark.io.mot import from_mot
from lours_spark.io.compact import compact_parquet, parquet_file_stats
from lours_spark.io.crowdhuman import from_crowd_human
from lours_spark.io.jsonl import read_jsonl, write_jsonl
from lours_spark.io.versioned import (
    commit_version,
    current_version,
    history,
    list_versions,
    prune_versions,
    publish_dataframe,
    read_current,
    read_version,
    rollback,
    start_version,
    version_delta,
)

__all__ = [
    "from_coco",
    "dataset_to_coco",
    "from_darknet",
    "dataset_to_darknet",
    "from_folder",
    "from_mot",
    "from_crowd_human",
    "read_jsonl",
    "write_jsonl",
    "compact_parquet",
    "parquet_file_stats",
    "start_version",
    "commit_version",
    "publish_dataframe",
    "read_current",
    "current_version",
    "list_versions",
    "prune_versions",
    "rollback",
    "version_delta",
    "read_version",
    "history",
]
