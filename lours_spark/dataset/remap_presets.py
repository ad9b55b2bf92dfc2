"""Named remap presets (reference ``lours/dataset/remap_presets/__init__.py:15-45``
registers CSV mappings like ``coco_to_pascalvoc`` and auto-inverts
bijective ones). Presets are tiny driver-side tables by nature."""

from __future__ import annotations

#: preset name → list of (input_category_id, output_category_id, output_name)
PRESETS: dict[str, list[tuple[int, int, str]]] = {
    # the classic COCO→VOC head: identity on the shared 20 classes is
    # dataset-specific; this ships a representative subset and the
    # registry mechanism — extend by registering more presets
    "coco_to_pascalvoc": [
        (1, 15, "person"),
        (2, 2, "bicycle"),
        (3, 7, "car"),
        (17, 8, "cat"),
        (18, 12, "dog"),
    ],
}


def register_preset(name: str, rows: list[tuple[int, int, str]]) -> None:
    PRESETS[name] = list(rows)


def get_preset(name: str, invert: bool = False) -> tuple[dict[int, int], dict[int, str]]:
    """Return (mapping, new_names); ``invert`` flips a bijective preset
    (reference auto-inversion)."""
    rows = PRESETS[name]
    if invert:
        outs = [o for _, o, _ in rows]
        if len(set(outs)) != len(outs):
            raise ValueError(f"preset {name!r} is not bijective; cannot invert")
        mapping = {o: i for i, o, _ in rows}
        names = {i: n for i, _, n in rows}
    else:
        mapping = {i: o for i, o, _ in rows}
        names = {o: n for _, o, n in rows}
    return mapping, names
