from lours_spark.functions.bbox import (
    convert_bbox,
    export_bbox,
    import_bbox,
    parse_bbox_format,
)
from lours_spark.functions.geometry import (
    bbox_validity,
    cap_bounding_box_coordinates,
    iou_columns,
)

__all__ = [
    "parse_bbox_format",
    "import_bbox",
    "export_bbox",
    "convert_bbox",
    "iou_columns",
    "cap_bounding_box_coordinates",
    "bbox_validity",
]
