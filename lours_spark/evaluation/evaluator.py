"""Multi-IoU, grouped detection evaluation — the reference's
``DetectionEvaluator.compute_precision_recall`` re-expressed as one
declarative plan.

Reference semantics (``lours/evaluation/detection/detection_evaluator.py:382-682``
+ ``util.py:189-321``):

- matches are computed ONCE (greedy, confidence-descending); each IoU
  threshold then re-labels a matched pair TP iff ``iou > t`` — no
  re-matching (``util.py:234``). The COCO protocol *re-matches* per
  threshold; both are offered via ``rematch_per_iou``.
- curve rows are ALL groundtruth rows (confidence of the matched
  prediction, 0.0 when unmatched) plus unmatched predictions
  (``detection_evaluator.py:624-655``) — so the precision denominator
  counts false-negative rows once the cut passes confidence 0.
- per (group × threshold): sort confidence-descending, keep the last
  cumulative point per distinct confidence (``util.py:228-234``),
  precision = tp/rank, recall = tp/n_targets, pad extremal points,
  monotone precision envelope (``util.py:271``), AP = right Riemann sum
  of precision over recall (``util.py:305-321``).
- grouping columns take the groundtruth's value, falling back to the
  prediction's for false positives (``detection_evaluator.py:588-592``).

Spark shape: the fan-out over ``ious`` is a tiny literal crossJoin (one
row per threshold) — ONE shuffle on the group key covers every
threshold's windows because the window partition key is
(groups, iou_threshold) and rows replicate under it. No per-threshold
job, no driver loop over groups.

AP additionally comes in COCO-accumulate form (``ap_at_recall_grid``):
precision sampled onto a recall grid (101 points) and averaged — the
form ``pycocotools.cocoeval.COCOeval.accumulate`` produces; parity is
asserted in ``tests/test_cocoeval_parity.py`` against an independent
NumPy implementation of the protocol.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: curve frames at or below this row count take the single-aggregation
#: array AP path (average_precisions_both); larger frames keep the
#: distributed window/explode forms — a per-key array would concentrate
#: a whole group's curve in one task
TINY_CURVE_ROWS = 100_000


def _results_table(
    matches: DataFrame,
    group_cols: Sequence[str],
    gt_attrs: DataFrame | None = None,
    pred_attrs: DataFrame | None = None,
) -> DataFrame:
    """The reference's ``results`` frame: one row per groundtruth (with
    its matched prediction's confidence, 0.0 if none) + one row per
    unmatched prediction. Extra group columns are joined from
    ``gt_attrs``/``pred_attrs`` (id → attribute frames), groundtruth
    value winning over prediction value (FPs use the prediction's)."""
    base = matches.select(
        "image_id",
        "category_id",
        "prediction_id",
        "groundtruth_id",
        F.coalesce(F.col("iou"), F.lit(0.0)).alias("iou"),
        F.when(
            F.col("groundtruth_id").isNotNull()
            & F.col("prediction_id").isNull(),
            F.lit(0.0),
        )
        .otherwise(F.col("confidence"))
        .alias("confidence"),
        F.col("groundtruth_id").isNotNull().alias("is_groundtruth"),
    )
    extra = [c for c in group_cols if c not in ("category_id",)]
    if extra:
        if gt_attrs is not None:
            g = gt_attrs.select(
                F.col("id").alias("groundtruth_id"),
                *[F.col(c).alias(f"__gt_{c}") for c in extra],
            )
            base = base.join(g, "groundtruth_id", "left")
        if pred_attrs is not None:
            p = pred_attrs.select(
                F.col("id").alias("prediction_id"),
                *[F.col(c).alias(f"__pr_{c}") for c in extra],
            )
            base = base.join(p, "prediction_id", "left")
        for c in extra:
            gt_c = f"__gt_{c}" if gt_attrs is not None else None
            pr_c = f"__pr_{c}" if pred_attrs is not None else None
            cols = [F.col(x) for x in (gt_c, pr_c) if x]
            base = base.withColumn(c, F.coalesce(*cols) if cols else F.lit(None))
        base = base.drop(
            *[f"__gt_{c}" for c in extra if gt_attrs is not None],
            *[f"__pr_{c}" for c in extra if pred_attrs is not None],
        )
    return base


def precision_recall_curves(
    matches: DataFrame,
    ious: Sequence[float] = (0.5,),
    group_cols: Sequence[str] = ("category_id",),
    gt_attrs: DataFrame | None = None,
    pred_attrs: DataFrame | None = None,
) -> DataFrame:
    """PR curve per (group × iou_threshold), reference construction.

    Output: group cols + ``iou_threshold, confidence, precision,
    recall, precision_env`` — distinct-confidence-collapsed, extremal
    points included, ``precision_env`` monotone.
    """
    groups = list(group_cols)
    results = _results_table(matches, groups, gt_attrs, pred_attrs)

    keys = groups + ["iou_threshold"]

    # distinct-confidence collapse (reference util.py:228-234: keep the
    # LAST cumulative point of each equal-confidence run) == cumulative
    # sums over PER-CONFIDENCE aggregates. Aggregating first is the
    # scale move: the groupBy pre-aggregates map-side, so the exchange
    # carries one row per (group, distinct confidence) instead of every
    # result row, and the windows below run over that tiny frame — no
    # multi-million-row sort in |groups| tasks. It is also order-free,
    # so no tie-break is needed for determinism. The iou_threshold
    # fan-out happens AFTER the aggregate, as one conditional-sum
    # column per threshold exploded into rows: the big results frame is
    # scanned once regardless of len(ious), and only the tiny
    # aggregated frame replicates.
    per_conf_wide = results.groupBy(*groups, "confidence").agg(
        *[
            F.sum(
                (
                    F.col("is_groundtruth") & (F.col("iou") > F.lit(float(t)))
                ).cast("long")
            ).alias(f"__tp_{i}")
            for i, t in enumerate(ious)
        ],
        F.count(F.lit(1)).alias("__n_c"),
        F.sum(F.col("is_groundtruth").cast("long")).alias("__gt_c"),
    )
    per_conf = per_conf_wide.select(
        *groups,
        "confidence",
        "__n_c",
        "__gt_c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(t)).alias("iou_threshold"),
                        F.col(f"__tp_{i}").alias("__tp_c"),
                    )
                    for i, t in enumerate(ious)
                ]
            )
        ).alias("__e"),
    ).select(
        *groups,
        F.col("__e.iou_threshold").alias("iou_threshold"),
        "confidence",
        F.col("__e.__tp_c").alias("__tp_c"),
        "__n_c",
        "__gt_c",
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.desc("confidence"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    curve = (
        per_conf.withColumn("__tp", F.sum("__tp_c").over(w_cum))
        .withColumn("__rank", F.sum("__n_c").over(w_cum))
        .withColumn("__ntargets", F.sum("__gt_c").over(w_all))
        .select(
            *keys,
            F.col("confidence"),
            (F.col("__tp").cast("double") / F.col("__rank")).alias("precision"),
            F.when(
                F.col("__ntargets") > 0,
                F.col("__tp").cast("double") / F.col("__ntargets"),
            )
            .otherwise(F.lit(None))
            .alias("recall"),
            F.lit(False).alias("is_pad"),
        )
    )
    # monotone envelope: running max of precision from the low-confidence
    # end (reference util.py:271 — np.maximum.accumulate reversed). The
    # pads' envelopes are statically known (head: precision 1.0 is the
    # global max; tail: lowest conf, nothing below it → its own 0.0).
    w_env = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("confidence"), F.desc("recall"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = curve.withColumn("precision_env", F.max("precision").over(w_env))
    # extremal points (reference util.py:258-262): (recall 0, precision 1)
    # at confidence 1 and (recall last, precision 0) at confidence 0.
    # Emitted IN the same pass: a union of pad legs would re-run the
    # whole upstream (matcher included) once per leg — exchange reuse
    # does not cover the map-side python stage — so instead the first
    # row of each group carries a 3-element array (itself + both pads)
    # that explodes into the pad rows. One upstream pass total.
    w_all = Window.partitionBy(*keys)
    w_rn = Window.partitionBy(*keys).orderBy(
        F.desc("confidence"), F.asc("recall")
    )
    point_cols = ["confidence", "precision", "recall", "is_pad", "precision_env"]
    main = F.struct(
        F.col("confidence"),
        F.col("precision"),
        F.col("recall"),
        F.col("is_pad"),
        F.col("precision_env"),
    )
    head = F.struct(
        F.lit(1.0).alias("confidence"),
        F.lit(1.0).alias("precision"),
        F.lit(0.0).alias("recall"),
        F.lit(True).alias("is_pad"),
        F.lit(1.0).alias("precision_env"),
    )
    tail = F.struct(
        F.lit(0.0).alias("confidence"),
        F.lit(0.0).alias("precision"),
        F.col("__last_recall").alias("recall"),
        F.lit(True).alias("is_pad"),
        F.lit(0.0).alias("precision_env"),
    )
    # window expressions can't sit inside a generator — project them to
    # plain columns first, then explode
    curve = curve.withColumn(
        "__last_recall", F.max("recall").over(w_all)
    ).withColumn("__rn", F.row_number().over(w_rn))
    points = F.when(
        F.col("__rn") == 1, F.array(main, head, tail)
    ).otherwise(F.array(main))
    exploded = curve.select(*keys, F.explode(points).alias("__p"))
    return exploded.select(*keys, *[F.col(f"__p.{c}").alias(c) for c in point_cols])


def average_precisions(curves: DataFrame, group_cols: Sequence[str] = ("category_id",)) -> DataFrame:
    """AP per (group × iou_threshold): right Riemann sum of the
    enveloped precision over recall (reference ``util.py:305-321``)."""
    keys = [*group_cols, "iou_threshold"]
    w = Window.partitionBy(*keys).orderBy(
        F.asc("recall"), F.desc("confidence")
    )
    d = F.col("recall") - F.coalesce(F.lag("recall").over(w), F.col("recall"))
    # (docstring example lives on compute_precision_recall, the public
    # entry point)
    return (
        curves.withColumn("__d", d)
        .groupBy(*keys)
        .agg(F.sum(F.col("precision_env") * F.col("__d")).alias("average_precision"))
    )


def ap_at_recall_grid(
    curves: DataFrame,
    group_cols: Sequence[str] = ("category_id",),
    n_points: int = 101,
) -> DataFrame:
    """COCO-accumulate AP: sample the enveloped precision at the first
    curve point with recall ≥ r for each grid r (``searchsorted left``),
    0 beyond max recall; AP = mean over the grid.

    Because the envelope is non-increasing along the curve while recall
    is non-decreasing, "value at first recall ≥ r" ==
    ``max(precision_env | recall ≥ r)`` — which aggregates without a
    join-back. The grid fan-out is a literal 101-element explode,
    shuffled once on the same (groups, threshold) key — but it explodes
    the DISTINCT-(recall) collapse of the curve, not every curve row:
    for equal-recall runs only the maximum envelope (== the run's first
    point, envelope non-increasing) can ever be sampled, so a
    map-side-combining ``groupBy(keys, recall).max(env)`` first shrinks
    the explode input from |curve| to |distinct recalls| — at corpus
    scale (millions of distinct confidences, bounded distinct recalls)
    that divides the generated-row volume by orders of magnitude with
    bit-identical output (same doubles compared).
    """
    keys = [*group_cols, "iou_threshold"]
    grid = F.array(
        *[F.lit(i / (n_points - 1)) for i in range(n_points)]
    )
    # pads are excluded: the COCO accumulate arrays contain detection
    # rows only — the synthetic (recall 0, precision 1) head point
    # would otherwise inflate the r=0 sample by a full grid share
    pts = (
        curves.filter(~F.col("is_pad"))
        .groupBy(*keys, "recall")
        .agg(F.max("precision_env").alias("precision_env"))
        .withColumn("r", F.explode(grid))
    )
    per_point = pts.groupBy(*keys, "r").agg(
        F.max(
            F.when(F.col("recall") >= F.col("r"), F.col("precision_env"))
        ).alias("p")
    )
    return per_point.groupBy(*keys).agg(
        (F.sum(F.coalesce(F.col("p"), F.lit(0.0))) / F.lit(float(n_points))).alias(
            "ap"
        )
    )


def average_precisions_both(
    curves: DataFrame,
    group_cols: Sequence[str] = ("category_id",),
    n_points: int = 101,
) -> DataFrame:
    """Riemann AP and COCO-grid AP in ONE aggregation pass — the
    small-curve fast path.

    :func:`average_precisions` + :func:`ap_at_recall_grid` each shuffle
    the curve frame again (window + groupBy, explode×grid + 2 groupBys)
    and are then joined — ~8 stage waves for frames that are tiny by
    construction (one row per group × distinct confidence). Here each
    (group × iou_threshold) key gathers its curve points into a sorted
    array once and evaluates both definitions as array expressions:

    - Riemann sum (reference ``util.py:305-321``): fold over points in
      (recall asc, confidence desc) order accumulating
      ``Σ precision_env · Δrecall`` — same order and same per-element
      arithmetic as the window form's ``lag``-difference.
    - grid AP (COCOeval accumulate): for each of the ``n_points`` grid
      recalls ``r``, ``max(precision_env | recall ≥ r)`` over non-pad
      points (envelope is non-increasing, so max == value at the first
      qualifying point), 0 past max recall; AP = mean.

    One shuffle, no explode, no join. Use when the collapsed curve
    frame is small (``compute_precision_recall`` routes on its existing
    row-count probe); at corpus scale with millions of distinct
    confidences per group, keep the distributed window/explode forms —
    a per-key array would concentrate a whole group in one task.
    Parity with the window forms is asserted in
    ``tests/test_evaluator.py``.
    """
    keys = [*group_cols, "iou_threshold"]
    # recall is NULL for zero-groundtruth groups (compute_precision_recall
    # emits None when __ntargets == 0); the window form's F.sum skips the
    # NULL env·Δrecall products and returns 0.0 there, but a fold
    # null-propagates through the accumulator. Coalesce to 0.0: every
    # delta in such a group is then 0, so the fold also yields 0.0, and
    # the grid samples stay 0.0 because env is 0 on all non-pad points
    # (no groundtruth → no true positives → precision 0).
    pt = F.struct(
        F.coalesce(F.col("recall"), F.lit(0.0)).alias("recall"),
        (-F.col("confidence")).alias("negc"),
        F.col("precision_env").alias("env"),
        F.col("is_pad").alias("is_pad"),
    )
    agg = curves.groupBy(*keys).agg(
        F.sort_array(F.collect_list(pt)).alias("__pts")
    )
    # Riemann: fold with (prev_recall, acc); first element's Δ is 0,
    # matching the window form's coalesce(lag, recall)
    riemann = F.aggregate(
        F.col("__pts"),
        F.struct(
            F.element_at("__pts", 1).getField("recall").alias("prev"),
            F.lit(0.0).alias("s"),
        ),
        lambda acc, x: F.struct(
            x.getField("recall").alias("prev"),
            (
                acc.getField("s")
                + x.getField("env") * (x.getField("recall") - acc.getField("prev"))
            ).alias("s"),
        ),
        lambda acc: acc.getField("s"),
    )
    agg = agg.withColumn(
        "__np", F.expr("filter(__pts, x -> NOT x.is_pad)")
    ).withColumn("average_precision", riemann)
    grid = F.array(*[F.lit(i / (n_points - 1)) for i in range(n_points)])
    samples = F.transform(
        grid,
        lambda r: F.coalesce(
            F.array_max(
                F.transform(
                    F.filter(
                        F.col("__np"), lambda x: x.getField("recall") >= r
                    ),
                    lambda x: x.getField("env"),
                )
            ),
            F.lit(0.0),
        ),
    )
    mean_grid = (
        F.aggregate(samples, F.lit(0.0), lambda acc, p: acc + p)
        / F.lit(float(n_points))
    )
    return agg.withColumn("ap", mean_grid).select(
        *keys, "average_precision", "ap"
    )


def compute_confusion_matrix(
    groundtruth: DataFrame,
    predictions: DataFrame,
    min_iou: float = 0.0,
    min_confidence: float = 0.0,
    label_col: str = "category_str",
    normalize: bool = True,
    matches: DataFrame | None = None,
) -> DataFrame:
    """Detection confusion matrix (reference
    ``detection_evaluator.py:180-380``): CATEGORY-AGNOSTIC greedy
    matches, labels joined back from both sides, then the reference's
    threshold split —

    - pairs with ``iou > min_iou`` (and all unmatched rows, ``iou`` 0)
      count as (gt_label, pred_label) cells;
    - pairs at ``0 < iou ≤ min_iou`` are too weak to be a match: the
      row DUPLICATES into a false negative (gt, None) AND a false
      positive (None, pred) (``detection_evaluator.py:326-350``);
    - predictions at ``confidence ≤ min_confidence`` count as missed
      (pred label → None, ``:353-356``); rows with both labels None
      drop (``:357-361``).

    Output: long-form (groundtruth_label, prediction_label, count[,
    share]) via :func:`confusion_counts` — pivot with
    ``confusion_matrix_pivot`` for the wide matrix.
    """
    from lours_spark.evaluation.confusion import confusion_counts
    from lours_spark.evaluation.matching import compute_matches

    if matches is None:  # facade memo skips the greedy pass
        matches = compute_matches(
            groundtruth, predictions, match_by_category=False
        )
    g = groundtruth.select(
        F.col("id").alias("groundtruth_id"),
        F.col(label_col).alias("groundtruth_label"),
    )
    p = predictions.select(
        F.col("id").alias("prediction_id"),
        F.col(label_col).alias("prediction_label"),
    )
    r = (
        matches.join(g, "groundtruth_id", "left")
        .join(p, "prediction_id", "left")
        .select(
            "groundtruth_label",
            "prediction_label",
            F.coalesce(F.col("iou"), F.lit(0.0)).alias("iou"),
            F.coalesce(F.col("confidence"), F.lit(0.0)).alias("confidence"),
        )
    )
    # one conditional-array explode instead of a strong/weak 3-leg
    # union: a union whose legs share the matcher subtree re-executes
    # the mapInPandas greedy kernel once PER LEG (exchange reuse does
    # not cover map-side Python stages) — measured 3-4x the matcher
    # cost on the composed pipeline before this restructure
    null_s = F.lit(None).cast("string")
    emitted = F.when(
        (F.col("iou") > min_iou) | (F.col("iou") == 0),
        F.array(
            F.struct(
                F.col("groundtruth_label").alias("g"),
                F.col("prediction_label").alias("p"),
            )
        ),
    ).otherwise(
        # 0 < iou <= min_iou: too weak to be a match — the row
        # duplicates into a false negative AND a false positive
        F.array(
            F.struct(F.col("groundtruth_label").alias("g"), null_s.alias("p")),
            F.struct(null_s.alias("g"), F.col("prediction_label").alias("p")),
        )
    )
    rows = r.select(F.explode(emitted).alias("e"), "confidence").select(
        F.col("e.g").alias("groundtruth_label"),
        F.col("e.p").alias("prediction_label"),
        "confidence",
    )
    rows = rows.withColumn(
        "prediction_label",
        F.when(
            F.col("confidence") <= min_confidence, F.lit(None).cast("string")
        ).otherwise(F.col("prediction_label")),
    ).filter(
        F.col("groundtruth_label").isNotNull()
        | F.col("prediction_label").isNotNull()
    )
    return confusion_counts(rows, normalize=normalize)


def compute_precision_recall(
    groundtruth: DataFrame,
    predictions: DataFrame,
    ious: Sequence[float] = (0.5,),
    group_cols: Sequence[str] = ("category_id",),
    rematch_per_iou: bool = False,
    gt_attrs: DataFrame | None = None,
    pred_attrs: DataFrame | None = None,
    cache_curves: bool = True,
    stats: dict | None = None,
    matches: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """End-to-end multi-IoU grouped evaluation (reference
    ``compute_precision_recall(ious=[...], groups=...)``).

    ``rematch_per_iou=False`` (reference protocol): ONE greedy matching,
    thresholds applied at curve time — the cheap path (one matcher pass
    regardless of ``len(ious)``).
    ``rematch_per_iou=True`` (COCO protocol): one greedy matching per
    threshold at acceptance ``iou > t`` — what ``COCOeval`` does; use
    with ``ap_at_recall_grid`` for pycocotools-comparable numbers.

    ``cache_curves`` materializes the curve frame eagerly (r12: via
    ``operators/_materialize.py`` — localCheckpoint by default, so the
    blocks are freed when the returned frames drop instead of leaking
    a CacheManager entry per call): both AP outputs derive from it,
    and a lazy persist is not enough — a downstream action that
    consumes ``ap`` and ``ap_grid`` together (e.g. their join)
    schedules both branch subtrees concurrently, so each would race to
    compute an unpopulated cache and the expensive matcher would run
    twice. Pass False if you only consume ``curves``.

    One perfectly-matched prediction per groundtruth → AP 1.0:

    >>> gt = spark.createDataFrame(
    ...     [(i, 0, 0, 10.0 * i, 0.0, 8.0, 8.0) for i in range(3)],
    ...     "id long, image_id long, category_id int, box_x_min double,"
    ...     " box_y_min double, box_width double, box_height double")
    >>> pred = gt.select(
    ...     (F.col("id") + 100).alias("id"), "image_id", "category_id",
    ...     "box_x_min", "box_y_min", "box_width", "box_height",
    ...     (0.9 - F.col("id") * 0.1).alias("confidence"))
    >>> res = compute_precision_recall(gt, pred, ious=[0.5])
    >>> r = res["ap_both"].first()
    >>> (r["category_id"], r["iou_threshold"], round(r["average_precision"], 6))
    (0, 0.5, 1.0)
    """
    from lours_spark.evaluation.matching import compute_matches

    if not rematch_per_iou:
        # a caller-supplied matches frame (e.g. the DetectionEvaluator
        # facade's memo) skips the expensive greedy pass entirely;
        # rematch_per_iou=True ignores it — each threshold rematches
        # at its own acceptance by definition
        if matches is None:
            matches = compute_matches(groundtruth, predictions)
        curves = precision_recall_curves(
            matches, ious, group_cols, gt_attrs, pred_attrs
        )
    else:
        per_t = []
        for t in ious:
            m = compute_matches(groundtruth, predictions, min_iou=float(t))
            per_t.append(
                precision_recall_curves(m, [t], group_cols, gt_attrs, pred_attrs)
            )
        curves = per_t[0]
        for c in per_t[1:]:
            curves = curves.unionByName(c)
    tiny = False
    if cache_curves:
        # materialize (eager localCheckpoint by default), NOT a bare
        # persist (r12): the persisted curve frame had no unpersist
        # path inside this function — one CacheManager entry leaked
        # per call for the session's life unless the caller remembered
        # to unpersist (the DetectionEvaluator facade did; the
        # functional path and every suite query did not). Checkpoint
        # blocks are freed by the ContextCleaner when the returned
        # frames drop; a caller's unpersist() stays a harmless no-op.
        # Strategy knob + executor-loss caveat:
        # operators/_materialize.py.
        from lours_spark.operators._materialize import materialize

        curves = materialize(curves, eager=True)
        n_curve_rows = curves.count()  # cheap: reads materialized blocks
        if stats is not None:
            stats["n_curve_rows"] = n_curve_rows
        if n_curve_rows <= TINY_CURVE_ROWS:
            # curve frames are tiny (groups × distinct confidences) but
            # inherit the window shuffle's partitioning — fan the
            # downstream AP jobs over a handful of tasks instead of 32
            # near-empty ones (coalesce on a cached frame reads the
            # cached blocks; nothing recomputes)
            curves = curves.coalesce(4)
            tiny = True
    aps = average_precisions(curves, group_cols)
    ap_grid = ap_at_recall_grid(curves, group_cols)
    # both-APs-in-one-pass frame: on tiny curve frames the single
    # sorted-array aggregation (no explode, no join) replaces ~8 stage
    # waves with 2; past the size probe, fall back to joining the
    # distributed window/explode forms
    if tiny:
        ap_both = average_precisions_both(curves, group_cols)
    else:
        ap_both = aps.join(ap_grid, [*group_cols, "iou_threshold"])
    if stats is not None:
        stats["ap_both_path"] = "array_fast" if tiny else "distributed_join"
    return {"curves": curves, "ap": aps, "ap_grid": ap_grid, "ap_both": ap_both}
