"""Named remap presets (reference
``lours/dataset/remap_presets/__init__.py:15-56`` loads CSV mappings
named ``<a>_to_<b>`` and auto-registers the inverse of bijective ones).
Presets are tiny driver-side tables by nature; the class lists are
public facts (COCO's 91-category vocabulary + supercategories, PASCAL
VOC's 20 classes).
"""

from __future__ import annotations

#: preset name → list of (input_category_id, output_category_id, output_name)
PRESETS: dict[str, list[tuple[int, int, str]]] = {
    # the 20 classes COCO and PASCAL VOC share (reference
    # remap_presets/coco_to_pascalvoc.csv — complete)
    "coco_to_pascalvoc": [
        (1, 15, "person"),
        (2, 2, "bicycle"),
        (3, 7, "car"),
        (4, 14, "motorbike"),
        (5, 1, "aeroplane"),
        (6, 6, "bus"),
        (7, 19, "train"),
        (9, 4, "boat"),
        (16, 3, "bird"),
        (17, 8, "cat"),
        (18, 12, "dog"),
        (19, 13, "horse"),
        (20, 17, "sheep"),
        (21, 10, "cow"),
        (44, 5, "bottle"),
        (62, 9, "chair"),
        (63, 18, "sofa"),
        (64, 16, "pottedplant"),
        (67, 11, "diningtable"),
        (72, 20, "tvmonitor"),
    ],
    # full COCO 91-id vocabulary → its 12 supercategories (reference
    # remap_presets/coco_to_supercategory.csv — complete)
    "coco_to_supercategory": [
        (1, 1, "person"),
        *[(i, 2, "vehicle") for i in range(2, 10)],
        *[(i, 3, "outdoor") for i in range(10, 16)],
        *[(i, 4, "animal") for i in range(16, 26)],
        *[(i, 5, "accessory") for i in range(26, 34)],
        *[(i, 6, "sports") for i in range(34, 44)],
        *[(i, 7, "kitchen") for i in range(44, 52)],
        *[(i, 8, "food") for i in range(52, 62)],
        *[(i, 9, "furniture") for i in range(62, 72)],
        *[(i, 10, "electronic") for i in range(72, 78)],
        *[(i, 11, "appliance") for i in range(78, 84)],
        *[(i, 12, "indoor") for i in range(84, 92)],
    ],
}


def register_preset(name: str, rows: list[tuple[int, int, str]]) -> None:
    PRESETS[name] = list(rows)


def list_available_presets() -> list[str]:
    """Registered preset names, including implicit inverses of
    bijective presets (reference auto-inversion, ``__init__.py:37-50``).

    >>> register_preset("foo_to_bar", [(0, 1, "thing")])
    >>> "foo_to_bar" in list_available_presets()
    True
    >>> "bar_to_foo" in list_available_presets()  # implicit inverse
    True
    >>> get_preset("bar_to_foo")[0]
    {1: 0}
    >>> del PRESETS["foo_to_bar"]
    """
    names = list(PRESETS)
    for name in list(PRESETS):
        if "_to_" in name:
            a, b = name.split("_to_", 1)
            inv = f"{b}_to_{a}"
            outs = [o for _, o, _ in PRESETS[name]]
            if inv not in PRESETS and len(set(outs)) == len(outs):
                names.append(inv)
    return sorted(names)


def get_preset(
    name: str, invert: bool = False
) -> tuple[dict[int, int], dict[int, str]]:
    """Return (mapping, new_names). ``name`` may be an implicit inverse
    (``b_to_a`` of a registered bijective ``a_to_b``); ``invert`` flips
    explicitly."""
    if name not in PRESETS and "_to_" in name and not invert:
        a, b = name.split("_to_", 1)
        flipped = f"{b}_to_{a}"
        if flipped in PRESETS:
            return get_preset(flipped, invert=True)
    rows = PRESETS[name]
    if invert:
        outs = [o for _, o, _ in rows]
        if len(set(outs)) != len(outs):
            raise ValueError(f"preset {name!r} is not bijective; cannot invert")
        mapping = {o: i for i, o, _ in rows}
        # inverted names: the input side's names are not stored in the
        # preset rows; reuse the output names keyed by the (now-output)
        # original input ids — matches the reference which keeps the
        # input_category_name column for this purpose only when present
        names = {i: n for i, _, n in rows}
    else:
        mapping = {i: o for i, o, _ in rows}
        names = {o: n for _, o, n in rows}
    return mapping, names
