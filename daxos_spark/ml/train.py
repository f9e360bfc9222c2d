"""Gradient-boosted-tree training/prediction — T1/T3 (reference
daxos/crossvalidate.py:148-175 ``fit_dask_xgb``, :194 ``predict``).

Spark-first: features live as ``array<float>`` in the fact table and are
promoted to MLlib vectors with ``array_to_vector`` (no Python UDF);
training is MLlib GBT (JVM, distributed); prediction is
``model.transform`` — label and features travel in the same row, so the
reference's manual partition→worker co-location (crossvalidate.py:21-53)
has no analogue here by design (SURVEY §4 O3).

Param mapping (reference xgboost → MLlib GBT):
    eta → stepSize, max_depth → maxDepth, subsample → subsamplingRate,
    colsample_bytree → featureSubsetStrategy, n_boost_round → maxIter.
``xgb_model`` warm-start (T7) has no MLlib equivalent — documented gap
(SURVEY §7.2). With xgboost installed, continuation runs through the
native ``xgboost.train(..., xgb_model=...)`` path (``_xgb_continue``) —
NOT through xgboost.spark's estimators, which accept no continuation
parameter (an ``xgb_model`` kwarg there would silently fall into
``arbitrary_params_dict`` and corrupt booster params instead of
continuing the ensemble).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.ml.classification import GBTClassificationModel, GBTClassifier
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.regression import GBTRegressionModel, GBTRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GBTParams:
    """Hyperparameters in reference vocabulary (crossvalidate.py:112-122).

    ``device`` gives the reference's GPU workflow (daxos/distribute.py:
    50-71 LocalCUDACluster + ``gpu_hist``; config_gpu.yaml) a syntactic
    home: "cpu" (default), "cuda", or "cuda:<ordinal>" — xgboost ≥ 2.0
    vocabulary, where ``device="cuda"`` replaces the retired
    ``tree_method="gpu_hist"``. Honored by the xgboost backend only;
    MLlib GBT has no GPU implementation, so a non-cpu device on the
    MLlib path raises loudly instead of silently training on CPU
    (documented delta, same policy as warm-start continuation).
    """

    eta: float = 0.1
    max_depth: int = 4
    subsample: float = 1.0
    colsample_bytree: float = 1.0
    n_boost_round: int = 20
    objective: str = "binary:logistic"  # or "reg:squarederror"
    seed: int = 42
    device: str = "cpu"
    # barrier-task count for the DISTRIBUTED continuation path (the
    # xgboost.spark estimators' num_workers vocabulary); None = auto
    # (min of cluster parallelism, input partitions, rows). Only
    # consulted when a continuation batch exceeds the driver-collect
    # bounds — see _xgb_continue.
    num_workers: int | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.device != "cpu" and not (
            self.device == "cuda"
            or (self.device.startswith("cuda:") and self.device[5:].isdigit())
        ):
            raise ValueError(
                f"device must be 'cpu', 'cuda', or 'cuda:<ordinal>', got {self.device!r}"
            )
        if self.num_workers is not None and self.num_workers < 1:
            raise ValueError(f"num_workers must be >= 1, got {self.num_workers!r}")

    @property
    def is_classification(self) -> bool:
        return self.objective.startswith("binary")


try:  # optional backend — not shipped in every environment
    from xgboost.spark import SparkXGBClassifier, SparkXGBRegressor  # noqa: F401

    HAS_XGBOOST = True
except ImportError:
    HAS_XGBOOST = False


def _prep(df: DataFrame, features_col: str, label_col: str) -> DataFrame:
    out = df
    if dict(df.dtypes)[features_col].startswith("array"):
        out = out.withColumn("__fvec", array_to_vector(F.col(features_col)))
    else:
        out = out.withColumn("__fvec", F.col(features_col))
    return out.withColumn("__label", F.col(label_col).cast("double"))


def _estimator(params: GBTParams):
    common = dict(
        featuresCol="__fvec",
        labelCol="__label",
        maxIter=params.n_boost_round,
        maxDepth=params.max_depth,
        stepSize=params.eta,
        subsamplingRate=params.subsample,
        seed=params.seed,
        featureSubsetStrategy=(
            "all" if params.colsample_bytree >= 1.0 else str(params.colsample_bytree)
        ),
        **params.extra,
    )
    if params.is_classification:
        return GBTClassifier(**common)
    return GBTRegressor(**common)


def _xgb_estimator(params: GBTParams):
    """xgboost.spark twin of `_estimator` — distributed from-scratch
    training on the optional backend. NOTE: deliberately does NOT accept
    an ``init_model``: SparkXGBClassifier/Regressor has no ``xgb_model``
    parameter, and an unknown kwarg silently lands in
    ``arbitrary_params_dict`` where it is merged into the booster params
    passed to ``xgboost.train(params=...)`` — continuation would
    silently not happen. Warm-start goes through ``_xgb_continue``
    instead, which calls native ``xgboost.train(..., xgb_model=...)``
    explicitly."""
    common = dict(
        features_col="__fvec",
        label_col="__label",
        num_round=params.n_boost_round,
        max_depth=params.max_depth,
        eta=params.eta,
        subsample=params.subsample,
        colsample_bytree=params.colsample_bytree,
        seed=params.seed,
        device=params.device,
        **params.extra,
    )
    if params.is_classification:
        return SparkXGBClassifier(**common)
    return SparkXGBRegressor(**common)


class XGBBoosterModel:
    """Driver-held native xgboost Booster with Spark-distributed scoring.

    Returned by the explicit continuation path (T7, reference
    daxos/crossvalidate.py:203-240): wraps the Booster produced by
    ``xgboost.train(..., xgb_model=prior)`` and scores DataFrames via an
    Arrow-batched ``mapInPandas`` with the serialized booster broadcast
    to executors — prediction stays distributed even though the
    continuation fit itself runs on driver-collected data.
    """

    def __init__(self, booster, objective: str):
        self.booster = booster
        self.objective = objective

    def get_booster(self):
        return self.booster

    def predict_df(
        self, df: DataFrame, features_col: str, pred_col: str
    ) -> DataFrame:
        from pyspark.sql.types import DoubleType, StructField, StructType

        raw = bytes(self.booster.save_raw(raw_format="json"))
        b = df.sparkSession.sparkContext.broadcast(raw)
        out_schema = StructType(
            list(df.schema.fields) + [StructField(pred_col, DoubleType())]
        )

        def score(batches):
            import numpy as np
            import xgboost as xgb

            bst = xgb.Booster()
            bst.load_model(bytearray(b.value))
            for pdf in batches:
                X = np.asarray(pdf[features_col].tolist(), dtype=np.float32)
                # binary:logistic boosters emit P(class=1) directly
                pdf[pred_col] = bst.inplace_predict(X).astype("float64")
                yield pdf

        return df.mapInPandas(score, out_schema)


# Loud guards for the driver-collected continuation fit: the reference's
# incremental refit (crossvalidate.py:203-240) runs on a read-time
# subsample, so the continuation batch is a small fraction of the fact
# table — but never let an accidental full-table collect OOM the driver.
# Both bounds apply: row count, and the float32 feature-matrix bytes the
# driver would hold (rows × p × 4 — the row cap alone is meaningless at
# the reference's 215k-wide production shape, where 2M rows would be
# 1.7 TB). See SCALE.md "T7 continuation collect" for the measured
# probe and the distributed-continuation design once xgboost ships.
MAX_CONTINUE_ROWS = 2_000_000
MAX_CONTINUE_BYTES = 8 << 30


def _xgb_continue(
    df: DataFrame,
    params: GBTParams,
    init_model,
    features_col: str,
    label_col: str,
) -> "XGBBoosterModel":
    """True boosting continuation: native ``xgboost.train`` with
    ``xgb_model`` set to the prior booster.

    xgboost.spark exposes no continuation parameter (see
    ``_xgb_estimator``), so the only correct route is the native
    trainer's documented ``xgb_model`` argument. Batches within the
    driver-collect bounds (min of MAX_CONTINUE_ROWS and
    MAX_CONTINUE_BYTES of float32 matrix) are Arrow-collected — the
    fast path for the reference's read-time-subsampled rounds; larger
    batches route to ``_xgb_continue_distributed`` (barrier tasks +
    xgboost collective). Scoring of the returned model is always
    distributed (``XGBBoosterModel.predict_df``).
    """
    import numpy as np
    import xgboost as xgb

    if hasattr(init_model, "get_booster"):
        init_model = init_model.get_booster()

    # byte-aware row cap: probe the feature width once (a 1-row job),
    # then never collect more float32 matrix than MAX_CONTINUE_BYTES.
    # Both feature encodings this path accepts are probed — a silent
    # p=0 on MLlib vectors would disable the byte guard on exactly the
    # widest input type; anything else fails loudly up front.
    from pyspark.ml.linalg import VectorUDT
    from pyspark.sql.types import ArrayType

    ftype = df.schema[features_col].dataType
    if isinstance(ftype, ArrayType):
        fcol = F.col(features_col)
    elif isinstance(ftype, VectorUDT):
        fcol = vector_to_array(F.col(features_col))
    else:
        raise TypeError(
            "warm-start continuation features must be array<numeric> or an "
            f"MLlib vector column, got {ftype.simpleString()}"
        )
    head = df.select(F.size(fcol).alias("p")).first()
    p = max(int(head["p"]), 0) if head is not None and head["p"] is not None else 0
    max_rows = min(MAX_CONTINUE_ROWS, MAX_CONTINUE_BYTES // max(4 * p, 1))
    # Route decision: a LIMIT-bounded count — partial execution that
    # ships 8 bytes, never the batch. The alternatives both lose: a
    # bounded collect-then-discard ships up to MAX_CONTINUE_BYTES to
    # the driver just to learn it must go distributed, and an unbounded
    # count() re-runs the full lineage even when over-bound. The fast
    # path below does re-execute the lineage once for the real collect,
    # but compute-only re-execution is small next to the Arrow
    # serialize+transfer it precedes (tools/continue_probe.py measured
    # the transfer at 21-40 MB/s — the dominant term).
    n_capped = df.limit(max_rows + 1).count()
    if n_capped > max_rows:
        try:
            # n_capped (> max_rows >= any realistic task parallelism) is
            # a sufficient lower bound for worker sizing — no need to
            # pay a full count of the over-bound batch
            return _xgb_continue_distributed(
                df, params, init_model, features_col, label_col, n_capped, p
            )
        except ImportError as e:
            raise ValueError(
                f"warm-start continuation batch is past the driver-collect "
                f"bound of {max_rows} rows "
                f"(= min({MAX_CONTINUE_ROWS} rows, {MAX_CONTINUE_BYTES} float32 "
                f"matrix bytes at p={p})), and this xgboost build lacks the "
                f"distributed-continuation dependencies ({e}); subsample the "
                "round's training chunk (the reference's incremental refit "
                "trains each round on a read-time subsample, "
                "crossvalidate.py:203-240) or raise the MAX_CONTINUE_* bounds "
                "explicitly"
            ) from e
    # the limit keeps the collect hard-bounded even if the input plan
    # were nondeterministic between the probe and this job
    pdf = (
        df.select(fcol.alias("__feat"), F.col(label_col).alias("__lbl"))
        .limit(max_rows)
        .toPandas()
    )
    X = np.asarray(pdf["__feat"].tolist(), dtype=np.float32)
    y = pdf["__lbl"].to_numpy(dtype="float64")
    native = _xgb_native_params(params)
    bst = xgb.train(
        native,
        xgb.DMatrix(X, label=y),
        num_boost_round=params.n_boost_round,
        xgb_model=init_model,
    )
    return XGBBoosterModel(bst, params.objective)


def _xgb_native_params(params: GBTParams) -> dict:
    return {
        "eta": params.eta,
        "max_depth": params.max_depth,
        "subsample": params.subsample,
        "colsample_bytree": params.colsample_bytree,
        "objective": params.objective,
        "seed": params.seed,
        "device": params.device,
        **params.extra,
    }


def _xgb_submodule(name: str):
    """``xgboost.<name>`` whether xgboost is the real package (lazy
    submodule — import it) or the single-file test fake (attribute)."""
    import importlib

    import xgboost as xgb

    mod = getattr(xgb, name, None)
    if mod is None:
        mod = importlib.import_module(f"xgboost.{name}")
    return mod


def _xgb_continue_distributed(
    df: DataFrame,
    params: GBTParams,
    init_model,
    features_col: str,
    label_col: str,
    n_rows: int,
    p: int = 0,
) -> "XGBBoosterModel":
    """Distributed boosting continuation — the reference's
    ``xgb.dask.train(..., xgb_model=prior)`` shape (crossvalidate.py:
    228-232) re-expressed on Spark barrier execution, for batches past
    the driver-collect bounds.

    xgboost.spark's estimators cannot do this (no ``xgb_model`` param —
    see ``_xgb_estimator``), so this reimplements the essential part of
    their internals on public APIs (xgboost >= 2.1 vocabulary): a
    RabitTracker on the driver, one barrier task per worker, each rank
    entering ``collective.CommunicatorContext`` so ``xgboost.train``'s
    histogram building allreduces across ranks, and the rank-0 booster
    serialized back. Every rank participates in every allreduce, so the
    returned ensemble is trained on ALL partitions — identical
    semantics to the single-node fit, unlike naive per-partition
    training. The 1-rank path (num_workers=1) is executed in the sealed
    environment against tests/fake_pkgs/xgboost.py's 1-rank collective;
    multi-rank needs the real dependency's allreduce.
    """
    import socket

    import xgboost as xgb

    tracker_mod = _xgb_submodule("tracker")
    _xgb_submodule("collective")  # fail fast on the driver if absent

    if hasattr(init_model, "get_booster"):
        init_model = init_model.get_booster()
    spark = df.sparkSession
    sc = spark.sparkContext
    n = params.num_workers or min(
        sc.defaultParallelism, df.rdd.getNumPartitions(), int(n_rows)
    )
    # n <= n_rows makes empty ranks unlikely under round-robin
    # repartitioning, but RoundRobinPartitioning starts each input
    # partition at a random offset, so emptiness is NOT guaranteed away
    # — an empty rank below still participates in every allreduce with
    # a (0, p) DMatrix rather than stalling the collective
    n = max(1, min(int(n), int(n_rows)))
    b_prior = sc.broadcast(bytes(init_model.save_raw(raw_format="json")))
    native = _xgb_native_params(params)
    n_round = params.n_boost_round

    host = sc.getConf().get("spark.driver.host", None) or socket.gethostbyname(
        socket.gethostname()
    )
    tracker = tracker_mod.RabitTracker(host_ip=host, n_workers=n)
    tracker.start()
    worker_args = dict(tracker.worker_args())

    def train_partition(iterator):
        import numpy as np  # noqa: PLC0415 — executor-side imports
        import xgboost as xgb  # noqa: PLC0415
        from pyspark import BarrierTaskContext  # noqa: PLC0415

        ctx = BarrierTaskContext.get()
        rank = ctx.partitionId()
        rows = [(r[0], r[1]) for r in iterator]
        if not rows:  # rare round-robin emptiness — still join the collective
            X = np.zeros((0, p), dtype=np.float32)
            y = np.zeros((0,), dtype=np.float64)
        else:
            if hasattr(rows[0][0], "toArray"):  # MLlib VectorUDT
                X = np.asarray([v.toArray() for v, _ in rows], dtype=np.float32)
            else:
                X = np.asarray([list(v) for v, _ in rows], dtype=np.float32)
            y = np.asarray([lbl for _, lbl in rows], dtype=np.float64)
        prior = xgb.Booster()
        prior.load_model(bytearray(b_prior.value))
        coll = getattr(xgb, "collective", None)
        if coll is None:
            import importlib  # noqa: PLC0415

            coll = importlib.import_module("xgboost.collective")
        args = dict(worker_args)
        args["dmlc_task_id"] = str(rank)
        ctx.barrier()  # all ranks up before the tracker handshake
        with coll.CommunicatorContext(**args):
            bst = xgb.train(
                native,
                xgb.DMatrix(X, label=y),
                num_boost_round=n_round,
                xgb_model=prior,
            )
        if rank == 0:
            yield bytes(bst.save_raw(raw_format="json"))

    part = df.select(features_col, label_col).repartition(n)
    try:
        out = part.rdd.barrier().mapPartitions(train_partition).collect()
    finally:
        # release the tracker sockets and the broadcast prior even when
        # the barrier job dies — repeated failed attempts must not leak
        # a listener thread + booster blob per call
        getattr(tracker, "free", lambda: None)()
        b_prior.unpersist()
    bst = xgb.Booster()
    bst.load_model(bytearray(out[0]))
    return XGBBoosterModel(bst, params.objective)


def fit_gbt(
    df: DataFrame,
    params: GBTParams,
    features_col: str = "features",
    label_col: str = "label",
    init_model=None,
    backend: str = "auto",
):
    """Train a distributed GBT; returns the fitted model.

    ``backend``: "mllib" (default engine), "xgboost" (requires the
    optional dependency), or "auto" (xgboost only when a warm-start
    ``init_model`` is given and the dependency is present). MLlib GBT
    cannot continue a booster (SURVEY §7.2 documented gap), so asking
    for ``init_model`` without xgboost raises instead of silently
    training from scratch.
    """
    if backend == "auto":
        backend = "xgboost" if (init_model is not None and HAS_XGBOOST) else "mllib"
    if backend == "xgboost":
        if not HAS_XGBOOST:
            raise ImportError(
                "backend='xgboost' requested but xgboost.spark is not installed"
            )
        if init_model is not None:
            # continuation MUST NOT go through the SparkXGB estimator —
            # it has no xgb_model param and would silently retrain from
            # scratch (see _xgb_estimator docstring).
            return _xgb_continue(df, params, init_model, features_col, label_col)
        return _xgb_estimator(params).fit(_prep(df, features_col, label_col))
    if init_model is not None:
        raise NotImplementedError(
            "warm-start continuation requires the xgboost backend "
            "(MLlib GBT cannot resume a booster); install xgboost or drop init_model"
        )
    if params.device != "cpu":
        raise NotImplementedError(
            f"device={params.device!r} requires the xgboost backend "
            "(MLlib GBT has no GPU implementation); install xgboost or use device='cpu'"
        )
    return _estimator(params).fit(_prep(df, features_col, label_col))


def predict_gbt(
    model,
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    pred_col: str = "y_pred",
) -> DataFrame:
    """Score a DataFrame; classification → P(class=1), regression → yhat.

    Output keeps all input columns + ``pred_col`` (the reference's
    predictions-keyed-by-IID sink shape, scripts/predict.py:161-170).
    """
    if isinstance(model, XGBBoosterModel):
        return model.predict_df(df, features_col, pred_col)
    scored = model.transform(_prep(df, features_col, label_col))
    # classification → P(class=1): MLlib and SparkXGB classifiers both
    # expose a probability vector; regression models expose prediction.
    if isinstance(model, GBTClassificationModel) or "probability" in scored.columns:
        pred = vector_to_array(F.col("probability")).getItem(1)
    else:
        pred = F.col("prediction")
    drop = [c for c in ("__fvec", "__label", "rawPrediction", "probability", "prediction") if c in scored.columns]
    return scored.withColumn(pred_col, pred.cast("double")).drop(*drop)


def save_model(model, path: str) -> None:
    """S11 analogue (daxos/read.py:11-31 booster JSON save/load)."""
    model.write().overwrite().save(path)


def load_model(path: str, classification: bool = True):
    cls = GBTClassificationModel if classification else GBTRegressionModel
    return cls.load(path)
