"""MERGE / upsert operators (SURVEY §2 S12-S14, B3).

Reference semantics:

- batch upsert         — ``db_access.py:291-317``
  (``sb.table(...).upsert(rows, on_conflict="id")``): INSERT the batch;
  rows whose key already exists REPLACE the stored row.
- partial row update   — ``update_article.py:15-41``
  (``.update(update_data).eq("id", id)``): only the given columns
  change; every other column of the matched row is preserved.

Storage format note (the input_hint says Iceberg): this sandbox has no
network and ships no Iceberg runtime jar (verified: no ``iceberg``/
``delta`` artifact under ``$SPARK_HOME/jars``, no ivy/maven cache, and
``spark.jars.packages`` cannot resolve offline), so the MERGE INTO
*statement* is unavailable. :func:`merge_write` therefore implements
exactly what Iceberg's copy-on-write MERGE does mechanically —
partition-pruned read-modify-replace with write-audit-publish ordering
— over hash-bucketed parquet, and the dataflow halves
(:func:`upsert`, :func:`update_columns`) are format-agnostic: pointed
at an Iceberg catalog they become the ON MATCHED / NOT MATCHED clauses
of ``MERGE INTO`` unchanged.

Scale design (the part that must survive 100 TB):

- The merge dataflow is ONE join keyed on the merge key. The source
  (a day's updates) is typically << target; Spark broadcasts it and the
  target never shuffles. A giant source degrades to a sort-merge join
  AQE can skew-split — still a single wide op.
- The storage merge never rewrites the whole table: touched buckets are
  discovered from the source keys (a collected DISTINCT over buckets —
  O(n_buckets), bounded), only those buckets are read and merged, and
  the result commits through a SINGLE atomic manifest publish (the
  snapshot layer below) — Iceberg's snapshot swap, rebuilt on rename.
  At thousands of buckets this is the same I/O profile as Iceberg COW:
  rewrite bytes proportional to touched partitions, not table size,
  and a kill at ANY point leaves the previous snapshot fully readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil


def upsert(target: DataFrame, source: DataFrame, key: str = "doc_id") -> DataFrame:
    """INSERT ... ON CONFLICT(key) DO UPDATE (full-row replace).

    Matching target rows are replaced by the source row; unmatched
    source rows are appended (db_access.py:291-317 semantics). One
    anti-join. No explicit broadcast hint: a typical merge batch sits
    under autoBroadcastJoinThreshold (64 MB here) and broadcasts on its
    own, while a giant source legitimately degrades to a sort-merge
    join AQE can skew-split — a forced hint would OOM on that case.
    """
    keep = target.join(source.select(key), key, "left_anti")
    return keep.unionByName(source.select(*target.columns))


def update_columns(
    target: DataFrame, updates: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Partial-column UPDATE ... WHERE key matches (update_article.py:15-41).

    ``updates`` carries the key plus only the columns to change; every
    other column of a matched row is preserved, unmatched update rows
    are ignored (the reference's ``.eq("id", ...)`` matches nothing and
    no row is written).

    Match detection rides an explicit ``__upd_matched`` marker column
    rather than NULL-ness of the update values, so SET col = NULL is
    representable — the unassign path (clustering.unassigned_members,
    ref db_access.py:408-523) writes cluster_id = NULL through here.
    No broadcast hint (see :func:`upsert`): small update batches
    broadcast automatically, giant ones sort-merge under AQE.
    """
    upd_cols = [c for c in updates.columns if c != key]
    renamed = updates.select(
        key,
        F.lit(True).alias("__upd_matched"),
        *[F.col(c).alias(f"__upd_{c}") for c in upd_cols],
    )
    joined = target.join(renamed, key, "left")
    out_cols = []
    for c in target.columns:
        if c == key:
            out_cols.append(F.col(c))
        elif c in upd_cols:
            # unmatched rows have NULL __upd_matched -> keep original;
            # matched rows take the update value EVEN WHEN IT IS NULL
            out_cols.append(
                F.when(F.col("__upd_matched"), F.col(f"__upd_{c}"))
                .otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


# ---------------------------------------------------------------------------
# snapshot-atomic storage layer
# ---------------------------------------------------------------------------
#
# Layout (the from-scratch rendition of Iceberg's snapshot mechanism):
#
#   table_dir/data/snap-<N>/bucket=<i>/part-*.parquet
#       data files written BY snapshot N (touched buckets only — COW)
#   table_dir/metadata/snap-<N>.json
#       manifest: for every live bucket, WHICH snapshot's data dir
#       serves it, plus parent pointer and audit counts
#
# Commit protocol (write-audit-publish):
#   1. write the merged touched-bucket data under data/snap-<N>/ —
#      invisible to readers (no manifest references it yet);
#   2. audit (row counts via the Observation API — no re-read);
#   3. publish: write metadata/.tmp-snap-<N>.json, then RENAME it to
#      metadata/snap-<N>.json.  Rename-without-overwrite is the one
#      atomic primitive on HDFS/file:, so the table flips from
#      snapshot N-1 to N in a single metadata operation across ALL
#      buckets at once — a kill anywhere before the rename leaves
#      snapshot N-1 fully readable (orphan data dirs are ignored by
#      readers and reclaimed by the next writer), and a concurrent
#      writer that lost the race gets rename()==False -> OCC conflict.
#
# Readers (:func:`read_table`) resolve the CURRENT snapshot by listing
# metadata/snap-*.json and taking the max id — snapshot-id allocation
# is monotonically increasing, so "max published" IS the committed
# tip; passing ``snapshot=`` reads any retained older manifest (time
# travel).  :func:`expire_snapshots` drops history.


def _manifest_path(table_dir: str, snap_id: int) -> str:
    return f"{table_dir}/metadata/snap-{snap_id}.json"


def snapshots(spark: SparkSession, table_dir: str) -> list[int]:
    """Published snapshot ids, ascending ([] for a missing table)."""
    ids = []
    for name in fsutil.list_names(spark, f"{table_dir}/metadata"):
        if name.startswith("snap-") and name.endswith(".json"):
            try:
                ids.append(int(name[5:-5]))
            except ValueError:
                pass
    return sorted(ids)


def current_snapshot_id(spark: SparkSession, table_dir: str) -> int | None:
    ids = snapshots(spark, table_dir)
    return ids[-1] if ids else None


def _read_manifest(spark: SparkSession, table_dir: str, snap_id: int) -> dict:
    import json

    path = _manifest_path(table_dir, snap_id)
    if not fsutil.exists(spark, path):
        raise FileNotFoundError(
            f"snapshot {snap_id} is not published (or expired) in {table_dir}"
        )
    return json.loads(fsutil.read_text(spark, path))


def read_table(
    spark: SparkSession, table_dir: str, snapshot: int | None = None
) -> DataFrame:
    """Read the table at the current (or a time-travel) snapshot.

    Buckets are grouped by the snapshot whose data dir serves them and
    each group is read with its own basePath (keeps the ``bucket``
    partition column + partition pruning); the groups union.  Group
    count = distinct serving snapshots <= retained history depth, so
    the plan stays small; :func:`expire_snapshots` (or any full
    rewrite) collapses it back to one.
    """
    snap_id = snapshot if snapshot is not None else current_snapshot_id(spark, table_dir)
    if snap_id is None:
        raise FileNotFoundError(f"no published snapshot in {table_dir}")
    man = _read_manifest(spark, table_dir, snap_id)
    if not man["buckets"]:
        # every row deleted: serve the (schema-preserving) empty table
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(
            __import__("json").loads(man["schema_json"])
        ).add("bucket", T.IntegerType())
        return spark.createDataFrame([], schema)
    by_serving: dict[int, list[int]] = {}
    for b, serving in man["buckets"].items():
        by_serving.setdefault(int(serving), []).append(int(b))
    parts = []
    for serving, bs in sorted(by_serving.items()):
        base = f"{table_dir}/data/snap-{serving}"
        parts.append(
            spark.read.option("basePath", base)
            .parquet(*[f"{base}/bucket={b}" for b in sorted(bs)])
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_write(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    key: str = "doc_id",
    n_buckets: int = 16,
    mode: str = "upsert",
) -> dict:
    """Snapshot-atomic copy-on-write MERGE into a hash-bucketed parquet
    table (bucket = pmod(xxhash64(key), n_buckets)); see the layout /
    commit-protocol comment above.

    Steps:
      1. bucket the source; collect the DISTINCT touched bucket ids
         (bounded by n_buckets — the only driver-side state);
      2. read ONLY those buckets of the current snapshot;
      3. dataflow-merge — ``mode``: "upsert" (:func:`upsert`),
         "update" (:func:`update_columns`), "delete" (WHEN MATCHED THEN
         DELETE: anti-join on the source keys; a bucket left with zero
         rows is dropped from the manifest, so full deletion keeps the
         table readable via the manifest's stored schema);
      4. write the merged buckets under data/snap-<N>/, then publish
         manifest N by atomic rename — one metadata op commits every
         touched bucket simultaneously.

    Returns {"snapshot": N, "touched_buckets": [...], "rows_written": n}.
    """
    import json

    bucket_of = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    src = source.withColumn("bucket", bucket_of)
    touched = sorted(
        r.bucket for r in src.select("bucket").distinct().collect()
    )
    cur_id = current_snapshot_id(spark, table_dir)
    if not touched:
        return {"snapshot": cur_id, "touched_buckets": [], "rows_written": 0}

    cur_man = _read_manifest(spark, table_dir, cur_id) if cur_id is not None else None
    new_id = (cur_id + 1) if cur_id is not None else 0
    data_dir = f"{table_dir}/data/snap-{new_id}"
    # a crashed writer may have left an unpublished data dir under the
    # id we are about to use — it was never readable; reclaim it
    fsutil.delete_dir(spark, data_dir)
    fsutil.delete_dir(spark, f"{table_dir}/metadata/.tmp-snap-{new_id}.json")

    existing = (
        [b for b in touched if str(b) in cur_man["buckets"]] if cur_man else []
    )
    if existing:
        by_serving: dict[int, list[int]] = {}
        for b in existing:
            by_serving.setdefault(int(cur_man["buckets"][str(b)]), []).append(b)
        parts = []
        for serving, bs in sorted(by_serving.items()):
            base = f"{table_dir}/data/snap-{serving}"
            parts.append(
                spark.read.option("basePath", base)
                .parquet(*[f"{base}/bucket={b}" for b in sorted(bs)])
            )
        tgt = parts[0]
        for p in parts[1:]:
            tgt = tgt.unionByName(p)
        if mode == "upsert":
            merged = upsert(tgt, src.select(*tgt.columns), key)
        elif mode == "update":
            merged = update_columns(tgt, src.drop("bucket"), key).withColumn(
                "bucket", bucket_of
            )
        elif mode == "delete":
            # MERGE ... WHEN MATCHED THEN DELETE: rewrite the touched
            # buckets without the source keys (copy-on-write, same
            # bucket pruning as the other modes)
            merged = tgt.join(src.select(F.col(key)).distinct(), key, "left_anti")
        else:
            raise ValueError(f"unknown merge mode: {mode}")
    else:
        if mode in ("update", "delete"):
            return {"snapshot": cur_id, "touched_buckets": [], "rows_written": 0}
        merged = src

    merged = merged.withColumn("bucket", bucket_of)
    from pyspark.sql import Observation

    obs = Observation(f"merge_write_snap{new_id}")
    # delete mode also needs per-bucket survivor counts: a bucket whose
    # rows all died writes no directory and must leave the manifest
    # (readers resolve only manifest-listed buckets)
    per_bucket = (
        [F.sum((F.col("bucket") == b).cast("long")).alias(f"b{b}") for b in touched]
        if mode == "delete" else []
    )
    merged = merged.observe(obs, F.count(F.lit(1)).alias("rows"), *per_bucket)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(data_dir)
    metrics = obs.get
    rows_written = metrics["rows"]

    buckets = dict(cur_man["buckets"]) if cur_man else {}
    for b in touched:
        if mode == "delete" and not metrics[f"b{b}"]:
            buckets.pop(str(b), None)
        else:
            buckets[str(b)] = new_id
    manifest = {
        "snapshot_id": new_id,
        "parent": cur_id,
        "n_buckets": n_buckets,
        "key": key,
        "buckets": buckets,
        "touched_buckets": touched,
        "rows_written": rows_written,
        # lets read_table serve a fully-emptied table (no bucket dirs
        # left to infer from)
        "schema_json": merged.drop("bucket").schema.json(),
    }
    fsutil.mkdirs(spark, f"{table_dir}/metadata")
    tmp = f"{table_dir}/metadata/.tmp-snap-{new_id}.json"
    fsutil.write_text(spark, tmp, json.dumps(manifest, indent=1))
    if not fsutil.rename(spark, tmp, _manifest_path(table_dir, new_id)):
        # another writer published this id first: clean our staging and
        # surface the optimistic-concurrency conflict
        fsutil.delete_dir(spark, tmp)
        fsutil.delete_dir(spark, data_dir)
        raise RuntimeError(
            f"snapshot {new_id} was published concurrently in {table_dir}; retry"
        )
    return {"snapshot": new_id, "touched_buckets": touched, "rows_written": rows_written}


def compact(spark: SparkSession, table_dir: str) -> dict:
    """Full-table compaction (Iceberg rewrite_data_files): rewrite every
    live bucket into ONE new snapshot.  Collapses the read plan back to
    a single basePath group (a long-running streaming MERGE sink
    otherwise accretes one serving snapshot per micro-batch cohort) and
    merges small files.  Commits through the same atomic manifest
    publish as merge_write; a kill mid-compaction leaves the previous
    snapshot current."""
    import json

    cur_id = current_snapshot_id(spark, table_dir)
    if cur_id is None:
        return {"snapshot": None, "rows_written": 0}
    cur_man = _read_manifest(spark, table_dir, cur_id)
    new_id = cur_id + 1
    data_dir = f"{table_dir}/data/snap-{new_id}"
    fsutil.delete_dir(spark, data_dir)

    tbl = read_table(spark, table_dir, snapshot=cur_id)
    from pyspark.sql import Observation

    obs = Observation(f"compact_snap{new_id}")
    tbl = tbl.observe(obs, F.count(F.lit(1)).alias("rows"))
    tbl.write.mode("overwrite").partitionBy("bucket").parquet(data_dir)
    rows_written = obs.get["rows"]

    manifest = {
        "snapshot_id": new_id,
        "parent": cur_id,
        "n_buckets": cur_man.get("n_buckets"),
        "key": cur_man.get("key"),
        "buckets": {b: new_id for b in cur_man["buckets"]},
        "touched_buckets": sorted(int(b) for b in cur_man["buckets"]),
        "rows_written": rows_written,
        "compaction": True,
    }
    tmp = f"{table_dir}/metadata/.tmp-snap-{new_id}.json"
    fsutil.write_text(spark, tmp, json.dumps(manifest, indent=1))
    if not fsutil.rename(spark, tmp, _manifest_path(table_dir, new_id)):
        fsutil.delete_dir(spark, tmp)
        fsutil.delete_dir(spark, data_dir)
        raise RuntimeError(
            f"snapshot {new_id} was published concurrently in {table_dir}; retry"
        )
    return {"snapshot": new_id, "rows_written": rows_written}


def expire_snapshots(
    spark: SparkSession, table_dir: str, keep_last: int = 2
) -> dict:
    """Drop manifests older than the newest ``keep_last`` and any data
    dir no kept manifest references (Iceberg expire_snapshots).  Data
    dirs referenced by a kept manifest survive even when their own
    manifest expires — time travel shrinks, current reads don't."""
    ids = snapshots(spark, table_dir)
    keep = ids[-keep_last:] if keep_last > 0 else []
    live_data = set()
    for sid in keep:
        man = _read_manifest(spark, table_dir, sid)
        live_data.update(int(v) for v in man["buckets"].values())
    dropped = []
    for sid in ids:
        if sid in keep:
            continue
        fsutil.delete_dir(spark, _manifest_path(table_dir, sid))
        if sid not in live_data:
            fsutil.delete_dir(spark, f"{table_dir}/data/snap-{sid}")
        dropped.append(sid)
    return {"dropped": dropped, "kept": keep}
