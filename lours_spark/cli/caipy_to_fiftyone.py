"""``caipy_to_fiftyone`` / ``c2f`` console command.

Re-expresses reference ``lours/cli/caipy_to_fiftyone.py:27-262``: load a
cAIpy tree (vanilla single-root or generic two-folder layout), push it
into fiftyone for inspection, optionally keep watching the folder and
update the fiftyone dataset as annotation files land.

Spark shape: the load is the distributed :func:`from_caipy` /
:func:`from_caipy_generic` readers; ``--watch`` uses the Structured
Streaming file-source watcher (:mod:`lours_spark.streaming.caipy_watch`)
instead of an inotify/watchdog thread — the stream's checkpoint gives
exactly-once delivery of new annotation files, and each micro-batch
refreshes the fiftyone dataset via the same conversion path.

The fiftyone import is guarded (the package is optional); the command
degrades to a clear error message when it is absent.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from argparse import ArgumentParser
from pathlib import Path


def get_argparser() -> ArgumentParser:
    """Argparse surface mirroring the reference CLI
    (``caipy_to_fiftyone.py:131-249``).

    >>> p = get_argparser()
    >>> a = p.parse_args(["--mode", "vanilla", "--input-folder", "/d",
    ...                   "--no-app", "--watch"])
    >>> (a.mode, a.persistent, a.watch, a.launch_app)
    ('vanilla', True, True, False)
    """
    parser = ArgumentParser(
        description=(
            "Directly convert a Caipy folder into fiftyone for quick inspection"
        ),
    )
    i_parser = parser.add_argument_group("Input arguments")
    i_parser.add_argument(
        "--mode",
        choices=["vanilla", "generic"],
        default="vanilla",
        help=(
            "vanilla: one --input-folder with Images/ and Annotations/; "
            "generic: explicit --images_root and --annotations_root"
        ),
    )
    i_parser.add_argument(
        "--input-folder", "-i", type=Path, default=None,
        help="When in vanilla mode, folder where the CAIPY dataset is stored",
    )
    i_parser.add_argument(
        "--images_root", "--ir", type=Path, default=None,
        help="When in generic mode, folder where images are stored",
    )
    i_parser.add_argument(
        "--annotations_root", "--ar", type=Path, default=None,
        help="When in generic mode, folder with the annotation json files",
    )
    i_parser.add_argument(
        "--splits-to-read", "-s", nargs="*", default=None,
        help="Optional list of splits to read (default: all)",
    )
    f_parser = parser.add_argument_group("Fiftyone arguments")
    f_parser.add_argument(
        "--dataset-name", "--name", "-n", default=None,
        help="Dataset name in the fiftyone app (default: folder name)",
    )
    f_parser.add_argument(
        "--not-persistent", "--np", action="store_false", dest="persistent",
        help="Do not keep the converted dataset in fiftyone after exit",
    )
    f_parser.add_argument(
        "--no-app", "--na", action="store_false", dest="launch_app",
        help="Convert without launching the fiftyone app",
    )
    f_parser.add_argument(
        "--watch", "-w", action="store_true",
        help=(
            "Keep watching the annotations folder (Structured Streaming "
            "file source); each new json refreshes the fiftyone dataset"
        ),
    )
    f_parser.add_argument(
        "--port", "-p", default=0, type=int,
        help="Fiftyone app server port (0 = random free port)",
    )
    f_parser.add_argument(
        "--only-local", action="store_true",
        help="Bind the app server to localhost only",
    )
    return parser


def _load(spark, args):
    from lours_spark.io.caipy import from_caipy, from_caipy_generic

    splits = args.splits_to_read
    if args.mode == "vanilla":
        if args.input_folder is None:
            raise SystemExit("--input-folder is required in vanilla mode")
        ds = from_caipy(spark, str(args.input_folder), splits=splits)
        default_name = Path(args.input_folder).name
    else:
        if args.annotations_root is None:
            raise SystemExit("--annotations_root is required in generic mode")
        ds = from_caipy_generic(
            spark,
            str(args.images_root) if args.images_root else None,
            str(args.annotations_root),
            splits_to_read=splits,
        )
        default_name = Path(args.annotations_root).parent.name
    return ds, args.dataset_name or default_name


def run(argv: list[str] | None = None) -> int:
    """CLI body (reference ``caipy_to_fiftyone.py:252-262``)."""
    import warnings

    args = get_argparser().parse_args(argv)
    if not args.launch_app and not args.persistent and not args.watch:
        warnings.warn(
            "App won't be launched and dataset is not persistent; this "
            "command will not do anything",
            RuntimeWarning,
            stacklevel=1,
        )
        return 1

    from lours_spark.io.fiftyone import try_import_fiftyone
    from lours_spark.session import get_spark

    fo = try_import_fiftyone()
    if fo is None:
        print(
            "fiftyone is not installed — install it to use caipy_to_fiftyone",
            file=sys.stderr,
        )
        return 2

    spark = get_spark("caipy-to-fiftyone")
    ds, name = _load(spark, args)

    from lours_spark.io.fiftyone import dataset_to_fiftyone

    fo_dataset = dataset_to_fiftyone(ds, name)
    fo_dataset.persistent = args.persistent

    session = None
    if args.launch_app:
        session = fo.launch_app(
            fo_dataset,
            port=args.port or None,
            address="127.0.0.1" if args.only_local else None,
        )

    if args.watch:
        from lours_spark.streaming.caipy_watch import watch_caipy

        # generic mode watches annotations_root ITSELF (the reference
        # observer schedules that exact folder) — parent+"/Annotations"
        # would watch the wrong tree whenever the folder isn't named
        # Annotations
        if args.mode == "vanilla":
            root, ann_root = str(args.input_folder), None
        else:
            ann_root = str(args.annotations_root)
            root = str(Path(ann_root).parent)
        with tempfile.TemporaryDirectory() as tmp:
            query = watch_caipy(
                spark,
                root,
                output_root=os.path.join(tmp, "out"),
                checkpoint_dir=os.path.join(tmp, "ckpt"),
                annotations_root=ann_root,
            )
            try:
                # refresh fiftyone once per NEW progress entry that
                # delivered rows — lastProgress lingers until the next
                # (possibly empty) micro-batch replaces it, so keying
                # on batchId avoids one full reconversion per second
                # after a single file drop
                last_refreshed_batch = -1
                while query.isActive:
                    progress = query.lastProgress
                    if (
                        progress
                        and (progress.get("numInputRows") or 0)
                        and progress.get("batchId", -1) != last_refreshed_batch
                    ):
                        last_refreshed_batch = progress.get("batchId", -1)
                        ds, _ = _load(spark, args)
                        fo_dataset.delete()
                        fo_dataset = dataset_to_fiftyone(ds, name)
                        fo_dataset.persistent = args.persistent
                    time.sleep(1.0)
            except KeyboardInterrupt:
                query.stop()
    elif session is not None:
        session.wait()
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(run())
