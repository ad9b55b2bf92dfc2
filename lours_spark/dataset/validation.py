"""Image-file validation — executor-side existence/readability checks.

Re-expresses reference ``lours/utils/testing.py:252-380``
(``get_invalid_images``) and ``lours/dataset/dataset.py:1154-1231``
(``remove_invalid_images``): the reference loops the images table on
the driver with tqdm + imageio; here the checks run as an Arrow-batched
``mapInPandas`` over the images table — each executor stats/reads only
its partition's files. At cluster scale this assumes ``images_root``
is shared storage (NFS/object store through a local mount), the same
assumption the per-image caipy/darknet writers already make.

Image decoding: PIL/imageio are unavailable in this environment, so
"can the image be loaded" is the dependency-free header sniff from
``io/folder.py`` (PNG/JPEG/BMP) — enough to catch truncated/garbage
files and metadata/size mismatches, the two failure classes the
reference's report distinguishes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPORT_SCHEMA = "id long, reason string, additional_info string"


def get_invalid_images(
    images: DataFrame,
    images_root: str,
    check_symlink: bool = False,
    load_images: bool = True,
) -> DataFrame:
    """Error report (id, reason, additional_info) for images whose file
    is missing, unreadable, or inconsistent with the table's metadata
    (reference ``testing.py:252-380`` report semantics).

    Executor-side file checks (mapInPandas over the image table — the
    driver never stats a file):

    >>> import os, tempfile
    >>> root = tempfile.mkdtemp()
    >>> _ = open(os.path.join(root, "ok.ppm"), "wb").write(
    ...     b"P6\\n2 1\\n255\\n" + bytes(6))
    >>> imgs = spark.createDataFrame(
    ...     [(1, 2, 1, "ok.ppm"), (2, 2, 1, "missing.ppm"),
    ...      (3, 9, 9, "ok.ppm")],
    ...     "id long, width int, height int, relative_path string")
    >>> rows = sorted(get_invalid_images(imgs, root).collect(),
    ...               key=lambda r: r["id"])
    >>> [(r["id"], r["reason"]) for r in rows]
    [(2, 'Not a valid path'), (3, 'Image metadata mismatch')]
    """
    import pandas as pd

    root = str(images_root)

    def check(batches):
        for pdf in batches:
            out_id, out_reason, out_info = [], [], []

            def err(i, reason, info=""):
                out_id.append(i)
                out_reason.append(reason)
                out_info.append(info)

            for i, rel, w, h in zip(
                pdf["id"], pdf["relative_path"], pdf["width"], pdf["height"]
            ):
                if os.path.isabs(rel):
                    err(i, "relative path is absolute")
                    continue
                path = os.path.join(root, rel)
                if check_symlink and not os.path.islink(path):
                    err(i, "Not a symlink")
                    continue
                if not os.path.isfile(path):
                    err(i, "Not a valid path")
                    continue
                if load_images:
                    from lours_spark.io.folder import _sniff_size

                    try:
                        with open(path, "rb") as f:
                            head = f.read(65536)
                        sw, sh = _sniff_size(head)
                    except OSError as e:
                        err(i, "Image loading failed", str(e))
                        continue
                    if sw == 0 and sh == 0:
                        err(i, "Image loading failed", "unreadable header")
                    elif (sw, sh) != (int(w), int(h)):
                        err(
                            i,
                            "Image metadata mismatch",
                            f"table says {int(w)}x{int(h)}, file is {sw}x{sh}",
                        )
            yield pd.DataFrame(
                {"id": out_id, "reason": out_reason, "additional_info": out_info}
            )

    return images.select("id", "relative_path", "width", "height").mapInPandas(
        check, _REPORT_SCHEMA
    )
