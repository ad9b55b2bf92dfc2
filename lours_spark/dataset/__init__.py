"""Dataset package — reference-parity exports
(``lours/dataset/__init__.py``): every ``from_*`` reader importable
from ``lours_spark.dataset`` exactly as reference call sites expect,
including the reference's capitalization aliases."""

from lours_spark.dataset.core import SparkDataset
from lours_spark.io.caipy import from_caipy, from_caipy_generic
from lours_spark.io.coco import from_coco, from_coco_keypoints
from lours_spark.io.crowdhuman import from_crowd_human
from lours_spark.io.darknet import (
    from_darknet,
    from_darknet_data,
    from_darknet_generic,
    from_darknet_json,
    from_darknet_yolov5,
)
from lours_spark.io.folder import from_files, from_folder
from lours_spark.io.mot import from_mot
from lours_spark.io.pascalvoc import from_pascalvoc, from_pascalvoc_detection

#: reference spelling aliases (lours/dataset/__init__.py exports
#: pascalVOC camel-case; Dataset is the facade class name there)
Dataset = SparkDataset
from_pascalVOC_generic = from_pascalvoc
from_pascalVOC_detection = from_pascalvoc_detection
from_parquet = SparkDataset.from_parquet

__all__ = [
    "SparkDataset",
    "Dataset",
    "from_folder",
    "from_files",
    "from_caipy",
    "from_caipy_generic",
    "from_coco",
    "from_coco_keypoints",
    "from_darknet",
    "from_darknet_yolov5",
    "from_darknet_generic",
    "from_darknet_json",
    "from_darknet_data",
    "from_crowd_human",
    "from_mot",
    "from_parquet",
    "from_pascalvoc",
    "from_pascalvoc_detection",
    "from_pascalVOC_generic",
    "from_pascalVOC_detection",
]
