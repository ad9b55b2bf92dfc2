"""JSON-schema-driven column derivation for the caipy reader.

Re-expresses reference
``lours/dataset/io/schema_util/schema_util_functions.py``: the
reference mines the dataset's JSON schema for enum domains
(``get_enums``, ``:47-82``) and for dtypes/default values applied on
read (``get_dtypes_and_default_values`` ``:116-163``,
``fill_with_dtypes_and_default_value`` ``:166-202``), so a caipy tree
with a schema file reads into booleanized columns and typed/filled
attributes with no hand-passed domains.

Spark shape: enum domains and fills are derived driver-side from the
schema dict (pure dict-walking, no data pass); application is narrow
column projections — ``withField`` rewrites inside native structs
(this engine keeps caipy nesting as ``StructType`` instead of the
reference's ``json_normalize`` dot-columns), casts compile into the
scan projection, and booleanization reuses
:func:`lours_spark.operators.booleanize.booleanize` after promoting
the nested field to the reference's flat dot-name.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def schema_enums(
    schema: dict, separator: str = ".", ignore_pattern: str = "a^"
) -> dict[str, list[str]]:
    """Flattened-name → sorted enum domain for every ``array`` property
    with ``items.enum`` and ``uniqueItems`` (reference ``get_enums``,
    ``schema_util_functions.py:47-82``; domains sorted for
    deterministic booleanized-column order where the reference keeps a
    set). ``ignore_pattern``: properties whose name matches this regex
    (``re.match``, per nesting level like the reference) are skipped
    entirely — the default ``"a^"`` matches nothing.

    >>> schema_enums({"properties": {
    ...     "attributes": {"type": "object", "properties": {
    ...         "colors": {"type": "array", "uniqueItems": True,
    ...                    "items": {"enum": ["red", "blue"]}}}},
    ...     "free": {"type": "array", "items": {"type": "string"}}}})
    {'attributes.colors': ['blue', 'red']}
    >>> schema_enums({"properties": {
    ...     "attributes": {"type": "object", "properties": {
    ...         "colors": {"type": "array", "uniqueItems": True,
    ...                    "items": {"enum": ["red", "blue"]}}}}}},
    ...     ignore_pattern="attr")
    {}
    """
    out: dict[str, list[str]] = {}
    for name, prop in (schema.get("properties") or {}).items():
        if re.match(ignore_pattern, name) or "type" not in prop:
            continue
        if (
            prop["type"] == "array"
            and "enum" in (prop.get("items") or {})
            and prop.get("uniqueItems", False)
        ):
            out[name] = sorted(prop["items"]["enum"])
        elif prop["type"] == "object":
            for sub, dom in schema_enums(prop, separator, ignore_pattern).items():
                out[f"{name}{separator}{sub}"] = dom
    return out


def schema_dtypes_defaults(
    schema: dict, separator: str = "."
) -> tuple[dict[str, str], dict[str, object]]:
    """(dtypes, defaults) over the schema's flattened keys (reference
    ``get_dtypes_and_default_values``,
    ``schema_util_functions.py:116-163``).

    ``dtypes`` maps key → Spark cast type for integer/boolean
    properties (the reference's Int64/boolean nullable-dtype concern
    dissolves here — Spark columns are nullable natively, so required
    and optional fields get the same type). ``defaults`` maps each
    OPTIONAL key to its schema ``default``, or ``[]`` for optional
    arrays; optional integers/booleans without a default stay null
    (the reference's ``pd.NA``).

    >>> d, dv = schema_dtypes_defaults({
    ...     "required": ["id"],
    ...     "properties": {"id": {"type": "integer"},
    ...                    "occluded": {"type": "boolean", "default": False},
    ...                    "parts": {"type": "array"}}})
    >>> d == {'id': 'long', 'occluded': 'boolean'} and dv == {
    ...     'occluded': False, 'parts': []}
    True
    """
    dtypes: dict[str, str] = {}
    defaults: dict[str, object] = {}

    def walk(s: dict, prefix: str, inherited_optional: bool) -> None:
        required = s.get("required") or []
        for name, prop in (s.get("properties") or {}).items():
            key = f"{prefix}{separator}{name}" if prefix else name
            optional = inherited_optional or name not in required
            t = prop.get("type")
            if t == "object":
                walk(prop, key, optional)
                continue
            if t == "integer":
                dtypes[key] = "long"
            elif t in ("bool", "boolean"):  # reference spells it "bool"
                dtypes[key] = "boolean"
            if optional:
                if prop.get("default") is not None:
                    defaults[key] = prop["default"]
                elif t == "array":
                    defaults[key] = []

    walk(schema, "", False)
    return dtypes, defaults


def schema_flat_keys(schema: dict, separator: str = ".") -> list[str]:
    """Every flattened key a (sub)schema describes (reference
    ``flatten_schema``, ``schema_util_functions.py:85-113``): object
    properties recurse with dot-names, everything else is a leaf.

    >>> schema_flat_keys({"properties": {
    ...     "id": {"type": "integer"},
    ...     "tags": {"type": "object", "properties": {
    ...         "time": {"enum": ["day"]}}}}})
    ['id', 'tags.time']
    """
    keys: list[str] = []
    for name, prop in (schema.get("properties") or {}).items():
        if prop.get("type") == "object":
            keys.extend(
                f"{name}{separator}{k}"
                for k in schema_flat_keys(prop, separator)
            )
        else:
            keys.append(name)
    return keys


def _resolve_path(
    df: DataFrame, key: str, separator: str = "."
) -> "tuple[str, list[str], T.DataType] | None":
    """(root column, struct-field path, leaf type) for a flattened key,
    or None when the path doesn't exist. A literal dot-named flat
    column (the post-debooleanize shape) wins over struct descent."""
    if key in df.columns:
        return key, [], df.schema[key].dataType
    parts = key.split(separator)
    root = parts[0]
    if len(parts) == 1 or root not in df.columns:
        return None
    dt = df.schema[root].dataType
    for p in parts[1:]:
        if not isinstance(dt, T.StructType) or p not in dt.fieldNames():
            return None
        dt = dt[p].dataType
    return root, parts[1:], dt


def _null_struct(dt: T.StructType) -> Column:
    """A non-NULL struct literal of ``dt`` with every field NULL —
    the substrate ``withField`` needs on rows whose parent struct is
    NULL (``UpdateFields`` on a NULL struct yields NULL, which would
    silently skip default fills for docs missing the whole object)."""
    return F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in dt.fields]
    )


def _with_nested(
    df: DataFrame,
    key: str,
    make: "callable",
    separator: str = ".",
    create_parents: bool = False,
) -> DataFrame:
    """Rewrite the column/struct-field at a flattened key with
    ``make(column, leaf_type) -> Column``; no-op when absent.
    ``create_parents=True`` (default fills) coalesces each NULL parent
    struct to a typed all-NULL struct first, so a document missing the
    whole object still receives nested defaults — the reference's
    ``json_normalize`` + ``fillna`` reaches those rows too (a NaN cell
    exists whether or not the parent dict did)."""
    resolved = _resolve_path(df, key, separator)
    if resolved is None:
        return df
    root, path, leaf = resolved
    if not path:
        return df.withColumn(root, make(F.col(f"`{root}`"), leaf))

    def rebuild(col: Column, dt: T.StructType, rest: list[str]) -> Column:
        if create_parents:
            col = F.coalesce(col, _null_struct(dt))
        if len(rest) == 1:
            return col.withField(rest[0], make(col.getField(rest[0]), leaf))
        return col.withField(
            rest[0],
            rebuild(col.getField(rest[0]), dt[rest[0]].dataType, rest[1:]),
        )

    root_dt = df.schema[root].dataType
    assert isinstance(root_dt, T.StructType)
    return df.withColumn(root, rebuild(F.col(f"`{root}`"), root_dt, path))


def apply_schema_columns(
    df: DataFrame, schema: dict, separator: str = "."
) -> DataFrame:
    """Fill defaults + apply dtypes from a (sub)schema (reference
    ``fill_with_dtypes_and_default_value``,
    ``schema_util_functions.py:166-202``): absent keys are skipped like
    the reference; defaults fill first, then integer/boolean casts.
    All rewrites are narrow projections — no shuffle, no data pass
    beyond the scan that was already happening."""
    dtypes, defaults = schema_dtypes_defaults(schema, separator)
    for key, default in defaults.items():
        if isinstance(default, list) and not default:
            df = _with_nested(
                df, key,
                lambda c, dt: F.coalesce(c, F.array().cast(dt)),
                separator, create_parents=True,
            )
        else:
            df = _with_nested(
                df, key,
                lambda c, dt, d=default: F.coalesce(c, F.lit(d).cast(dt)),
                separator, create_parents=True,
            )
    for key, cast_to in dtypes.items():
        df = _with_nested(
            df, key, lambda c, _dt, t=cast_to: c.cast(t), separator
        )
    return df


def promote_nested_column(
    df: DataFrame, key: str, separator: str = "."
) -> DataFrame:
    """Pull a struct field out into a flat dot-NAMED column (the
    reference's ``json_normalize`` name for it) so table-level
    operators like ``booleanize`` can target it; the field is dropped
    from its struct (struct dropped too once emptied). No-op when the
    key is already flat or absent."""
    resolved = _resolve_path(df, key, separator)
    if resolved is None:
        return df
    root, path, _leaf = resolved
    if not path:
        return df
    df = df.withColumn(key, F.col(key))

    # Spark refuses to dropFields a struct empty — when removing the
    # field would empty its parent, remove the parent instead (and so
    # on up to the root column). Walk down recording field counts.
    counts = []
    dt = df.schema[root].dataType
    for p in path:
        assert isinstance(dt, T.StructType)
        counts.append(len(dt.fields))
        dt = dt[p].dataType
    # deepest level whose struct keeps other fields; -1 = root emptied
    keep = max(
        (i for i, n in enumerate(counts) if n > 1), default=-1
    )
    if keep < 0:
        return df.drop(root)

    def drop_field(col: Column, i: int) -> Column:
        if i == keep:
            return col.dropFields(f"`{path[i]}`")
        return col.withField(path[i], drop_field(col.getField(path[i]), i + 1))

    return df.withColumn(root, drop_field(F.col(f"`{root}`"), 0))
