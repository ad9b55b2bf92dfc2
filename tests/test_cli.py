"""CLI entry-point tests (reference lours/cli/caipy_to_fiftyone.py:131-262
argparse surface; fiftyone itself is absent in this environment, so the
app-side is exercised up to the guarded-import seam)."""

from __future__ import annotations

import json

import pytest


def test_argparser_surface_matches_reference():
    from lours_spark.cli.caipy_to_fiftyone import get_argparser

    p = get_argparser()
    args = p.parse_args(
        ["--mode", "generic", "--ar", "/a", "--ir", "/i", "-s", "train",
         "-n", "demo", "--np", "--na", "-w", "-p", "5151", "--only-local"]
    )
    assert args.mode == "generic"
    assert str(args.annotations_root) == "/a"
    assert str(args.images_root) == "/i"
    assert args.splits_to_read == ["train"]
    assert args.dataset_name == "demo"
    assert args.persistent is False
    assert args.launch_app is False
    assert args.watch is True
    assert args.port == 5151
    assert args.only_local is True
    # defaults mirror the reference: vanilla, persistent, app launched
    d = p.parse_args([])
    assert (d.mode, d.persistent, d.launch_app, d.watch) == (
        "vanilla", True, True, False
    )


def test_run_is_noop_warning_without_app_or_persistence():
    from lours_spark.cli.caipy_to_fiftyone import run

    with pytest.warns(RuntimeWarning):
        assert run(["--no-app", "--not-persistent"]) == 1


def test_run_degrades_without_fiftyone(tmp_path, capsys):
    """fiftyone is not installed here: the command exits 2 with a clear
    message instead of crashing."""
    from lours_spark.cli.caipy_to_fiftyone import run

    assert run(["-i", str(tmp_path)]) == 2
    assert "fiftyone" in capsys.readouterr().err


def test_load_dispatch_vanilla_and_generic(spark, tmp_path):
    from lours_spark.cli.caipy_to_fiftyone import _load, get_argparser

    ann = tmp_path / "root" / "Annotations" / "train"
    ann.mkdir(parents=True)
    doc = {
        "image": {"id": 1, "file_name": "1.jpg", "width": 4, "height": 4},
        "annotations": [
            {"id": 10, "category_id": 1, "category_str": "car",
             "bbox": [0.0, 0.0, 1.0, 1.0]}
        ],
    }
    (ann / "1.json").write_text(json.dumps(doc))

    args = get_argparser().parse_args(["-i", str(tmp_path / "root")])
    ds, name = _load(spark, args)
    assert ds.images.count() == 1 and name == "root"

    args = get_argparser().parse_args(
        ["--mode", "generic", "--ar", str(tmp_path / "root" / "Annotations")]
    )
    ds, name = _load(spark, args)
    assert ds.annotations.count() == 1 and name == "root"

    with pytest.raises(SystemExit):
        _load(spark, get_argparser().parse_args(["--mode", "generic"]))
