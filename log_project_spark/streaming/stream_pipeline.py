"""Structured Streaming variant of the stateful pipeline.

The reference "streams" by iterating an in-memory list
(/root/reference/src/stream.py:335-374); the honest Spark analog of
its semantics is the batch kernel (SURVEY.md §2.7). This module is the
true streaming path for incremental arrival: parquet/file source ->
same Catalyst parse stage -> per-conv_id conformal + drift state via
applyInPandasWithState -> foreachBatch fan-out sinks.

State per conv_id (schema'd, checkpointable by Spark):
- buf:   array<double>  conformal window since last reset (C1)
- seen:  long           1-based event count in scope (C5 warmup)
- det:   binary         pickled Adwin detector (C7), empty = none

Within each micro-batch, rows of a group are processed in turn_idx
order; ACROSS micro-batches, correctness requires the source to
deliver turns in non-decreasing turn_idx per conv_id (true for
append-only transcript logs). No watermark: the contract is stable
(conv_id, turn_idx) ordering, not event-time windowing.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..adwin import Adwin
from ..config import PipelineConfig

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("thr", T.DoubleType()),
        T.StructField("is_anom", T.BooleanType()),
        T.StructField("is_drift", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        # conformal window in ARRIVAL order since last reset (the
        # eviction order; the sorted view is rebuilt per micro-batch)
        T.StructField("arrivals", T.ArrayType(T.DoubleType())),
        T.StructField("seen", T.LongType()),
        T.StructField("det", T.BinaryType()),
    ]
)


def make_stateful_kernel(cfg: PipelineConfig):
    """Returns the applyInPandasWithState function implementing
    C1/C2/C5/C7/C3 with persistent per-group state."""
    alpha, window, warmup = cfg.alpha, cfg.window, cfg.warmup
    use_drift = cfg.drift_detector == "adwin"
    delta = cfg.adwin_delta

    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect
        from collections import deque

        if state.exists:
            arrivals_list, seen, det_blob = state.get
            arrivals: deque[float] = deque(arrivals_list)
            detector = pickle.loads(bytes(det_blob)) if det_blob else None
        else:
            arrivals, seen = deque(), 0
            detector = Adwin(delta=delta) if use_drift else None
        buf = sorted(arrivals)  # sorted view, kept in sync below

        for pdf in pdfs:
            pdf = pdf.sort_values("turn_idx", kind="mergesort")
            scores = pdf["score"].to_numpy(dtype=np.float64)
            n = len(scores)
            thr = np.empty(n)
            anom = np.zeros(n, dtype=bool)
            drift = np.zeros(n, dtype=bool)
            for i in range(n):
                s = float(scores[i])
                seen += 1
                bisect.insort(buf, s)
                arrivals.append(s)
                if len(arrivals) > window:
                    oldest = arrivals.popleft()
                    del buf[bisect.bisect_left(buf, oldest)]
                m = len(buf)
                k = max(1, int(round((1.0 - alpha) * m)))
                t = buf[k - 1]
                thr[i] = t
                anom[i] = seen >= warmup and s > t
                if detector is not None and detector.update(s):
                    drift[i] = True
                    buf.clear()
                    arrivals.clear()
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy(),
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "score": scores,
                    "thr": thr,
                    "is_anom": anom,
                    "is_drift": drift,
                }
            )

        det_blob = pickle.dumps(detector) if detector is not None else b""
        state.update((list(arrivals), seen, det_blob))

    return kernel


def scored_stream(
    parsed_stream: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """parsed_stream must carry (conv_id, turn_idx, score)."""
    kernel = make_stateful_kernel(cfg)
    return (
        parsed_stream.select("conv_id", "turn_idx", F.col("score").cast("double"))
        .groupBy("conv_id")
        .applyInPandasWithState(
            kernel,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def route_foreach_batch(out_dir: str):
    """foreachBatch sink: route each micro-batch through the same
    single-pass fan-out as batch mode (one write partitioned by sink,
    no per-sink rescan — VERDICT r1 #6 applies here too). Per-sink
    paths are <out_dir>/sink=<name>/."""
    from ..operators.route import with_sink

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        with_sink(batch_df).write.mode("append").partitionBy("sink").parquet(out_dir)

    return write
