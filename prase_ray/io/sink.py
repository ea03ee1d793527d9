"""Generic resumable partitioned-Parquet sink.

`write_partitioned` is the corpus-output pattern the PRASE-specific
writers (save_results_ds, DatasetAlignState.save) use, as a first-class
operator for ANY Dataset: hash-partition by a key column into
``out_dir/part=K/`` directories, each written ATOMICALLY (tmp dir →
rename), so a failed run can be re-submitted and only the missing
partitions are recomputed-through-the-shuffle and rewritten — never one
giant file, never a partial partition visible to readers.

Resume contract:
- a ``part=K`` directory existing == that partition is complete (the
  rename is the commit point; a crash mid-write leaves only
  ``part=K.tmp``, which the rerun clears);
- on rerun with ``skip_finished=True`` the finished partitions' rows
  are dropped BEFORE the shuffle (broadcast finished-set, per-batch
  filter), so the write-side work for them is zero — upstream
  transforms still stream once, which is the documented limit of
  lineage-free resume (checkpoint upstream stages separately if they
  dominate).
"""
from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from prase_ray.functions.hashing import splitmix64


def _finished_parts(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for name in os.listdir(out_dir):
        if name.startswith("part=") and not name.endswith(".tmp"):
            try:
                out.add(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return out


def write_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str,
    *,
    num_partitions: int = 64,
    skip_finished: bool = True,
    lineage: dict | None = None,
) -> dict:
    """Write ``ds`` as ``out_dir/part=K/data.parquet`` with
    K = splitmix64(key) % num_partitions.  Returns
    ``{"written": [...], "skipped": [...], "rows_written": n}``.

    One writer task per partition (groupby(part).map_groups), each
    committing via tmp-dir rename; partition count bounds both the
    shuffle fan-in and the file count — size it so a partition is a
    few hundred MB at the target scale.

    Per-partition LINEAGE + METRICS (the resume audit trail): every
    partition commits a ``_meta.json`` beside its data — rows, bytes,
    key min/max, write wall-time, and the caller-supplied ``lineage``
    descriptor (stage name, input fingerprint, config hash...).  The
    meta file is written INSIDE the tmp dir, so it becomes visible
    atomically with the data at the rename; a partition can never be
    committed without its metrics.  Each run also appends one line to
    ``out_dir/_runs.jsonl`` (written/skipped/rows + lineage), giving
    the job-level history a 256-node operator reads first when a run
    is re-submitted.  ``read_partition_metrics`` returns the per-
    partition rows as a DataFrame."""
    os.makedirs(out_dir, exist_ok=True)
    finished = _finished_parts(out_dir) if skip_finished else set()
    if not skip_finished:
        for k in _finished_parts(out_dir):
            shutil.rmtree(os.path.join(out_dir, f"part={k}"))
    fin_ref = ray.put(np.array(sorted(finished), dtype=np.int64))
    P = num_partitions

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        done = ray.get(fin_ref)
        part = (
            splitmix64(b[key_col].to_numpy(np.int64).view(np.uint64))
            % np.uint64(P)
        ).astype(np.int32)
        b = b.copy()
        b["__part"] = part
        if len(done):
            b = b[~np.isin(part.astype(np.int64), done)]
        return b

    lin = dict(lineage or {})

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        part = int(g["__part"].iloc[0])
        tmp = os.path.join(out_dir, f"part={part}.tmp")
        final = os.path.join(out_dir, f"part={part}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # crashed earlier attempt
        os.makedirs(tmp)
        data_path = os.path.join(tmp, "data.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                g.drop(columns=["__part"]), preserve_index=False
            ),
            data_path,
        )
        keys = g[key_col]
        kmin, kmax = keys.min(), keys.max()
        cast = int if pd.api.types.is_integer_dtype(keys) else str
        meta = {
            "part": part,
            "rows": int(len(g)),
            "bytes": int(os.path.getsize(data_path)),
            "key_col": key_col,
            "key_min": cast(kmin),
            "key_max": cast(kmax),
            "write_sec": round(time.time() - t0, 4),
            "lineage": lin,
        }
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(meta, f)
        os.rename(tmp, final)  # commit point
        return pd.DataFrame({"part": [part], "rows": [len(g)]})

    summaries = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
    )
    written = sorted(int(p) for p in summaries.get("part", []))
    summary = {
        "written": written,
        "skipped": sorted(finished),
        "rows_written": int(summaries["rows"].sum()) if len(summaries) else 0,
    }
    with open(os.path.join(out_dir, "_runs.jsonl"), "a") as f:
        f.write(json.dumps({**summary, "lineage": lin}) + "\n")
    return summary


def read_partitioned(out_dir: str) -> ray.data.Dataset:
    """Read back every committed partition (ignores ``*.tmp``)."""
    files = [
        os.path.join(out_dir, f"part={k}", f)
        for k in sorted(_finished_parts(out_dir))
        for f in sorted(os.listdir(os.path.join(out_dir, f"part={k}")))
        if f.endswith(".parquet")
    ]
    # partitioning=None: the part=K path segment is a COMMIT marker,
    # not a hive column — don't resurface it in the schema
    return ray.data.read_parquet(files, partitioning=None)


def read_partition_metrics(out_dir: str) -> pd.DataFrame:
    """Per-partition lineage + metrics rows (one per committed
    ``part=K/_meta.json``) — what a monitoring / resume audit reads."""
    rows = []
    for k in sorted(_finished_parts(out_dir)):
        p = os.path.join(out_dir, f"part={k}", "_meta.json")
        if os.path.exists(p):
            with open(p) as f:
                rows.append(json.load(f))
    return pd.DataFrame(rows)
