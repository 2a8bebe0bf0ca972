"""Explicit file-based exchange: the engine's alternative to Ray's sort-based
groupby shuffle for the encode pipeline.

Why: a sort shuffle moves every row through the sort machinery and its
coordination cost dominates medium-sized jobs; at cluster scale the same
pattern (map-side hash split → shared-storage chunk files → one reduce task
per partition) is the classic external shuffle used by production engines on
object storage. Here the "shared storage" is a directory (on a cluster:
NFS/S3-style storage reachable by all nodes).

Stage 1 (``SpillPartitions``): each input batch is vectorized-split by the
``_part`` column (one dictionary-encode + one take) and each partition slice
is appended as a content-addressed Arrow IPC file
``exchange/<pid>/<crc>-<rows>.arrow`` (atomic temp+rename; a retried task
rewrites byte-identical files, so retries are idempotent and duplicates are
impossible).

Stage 2 (``ExchangeEncoder``): one task per partition reads its chunk files
(sorted name order → deterministic row order) and encodes via
``PartitionEncoder.encode_partition``.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .encoder import PART_COL, PartitionEncoder
from ..state.manifest import sanitize_partition_id


def _ipc_table_bytes(table: pa.Table, compression: str | None = None) -> bytes:
    """Plain IPC by default: the exchange tier here is /dev/shm (memory), so
    compressing only adds CPU. On a real cluster with network/disk shuffle
    storage, pass compression="lz4" to trade scalable CPU for bandwidth."""
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.ipc.new_stream(sink, table.schema, options=opts) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def read_ipc_table(path: str) -> pa.Table:
    with pa.ipc.open_stream(pa.memory_map(path)) as r:
        return r.read_all()


class SpillPartitions:
    """map_batches stage: split a batch by ``_part`` and append each slice to
    the partition's exchange directory. Emits tiny ack rows."""

    def __init__(self, exchange_dir: str):
        self.exchange_dir = exchange_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"pid": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        # vectorized split: dictionary-encode the key, sort by code, slice runs
        codes_arr = pc.dictionary_encode(batch[PART_COL].combine_chunks())
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        labels = codes_arr.dictionary.to_pylist()
        order = np.argsort(codes, kind="stable")
        sorted_batch = batch.take(pa.array(order))
        sorted_codes = codes[order]
        boundaries = np.flatnonzero(np.diff(sorted_codes)) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(codes)]])
        pids, rows = [], []
        data = sorted_batch.drop_columns([PART_COL])
        for s, e in zip(starts, ends):
            raw_pid = labels[sorted_codes[s]]
            pid = sanitize_partition_id(str(raw_pid))
            sl = data.slice(int(s), int(e - s))
            buf = _ipc_table_bytes(sl)
            d = os.path.join(self.exchange_dir, pid)
            os.makedirs(d, exist_ok=True)
            # content-addressed name → retried tasks rewrite identical files
            name = f"{zlib.crc32(buf):08x}-{sl.num_rows}.arrow"
            final = os.path.join(d, name)
            if not os.path.exists(final):
                tmp = os.path.join(d, f".tmp-{os.getpid()}-{name}")
                with open(tmp, "wb") as f:
                    f.write(buf)
                os.replace(tmp, final)
            # raw label recorded once per partition for lineage
            label_file = os.path.join(d, "_label")
            if not os.path.exists(label_file):
                tmp = os.path.join(d, f".tmplabel-{os.getpid()}")
                with open(tmp, "w") as f:
                    f.write(str(raw_pid))
                os.replace(tmp, label_file)
            pids.append(pid)
            rows.append(sl.num_rows)
        return pa.table({"pid": pa.array(pids), "rows": pa.array(rows, type=pa.int64())})


class ExchangeEncoder(PartitionEncoder):
    """Stage-2 actor: one call per partition id; reads that partition's
    exchange chunks and encodes them as one partition."""

    def __init__(self, out_dir: str, exchange_dir: str, lineage: dict | None = None):
        super().__init__(out_dir, lineage)
        self.exchange_dir = exchange_dir

    def __call__(self, batch) -> pa.Table:
        pid_lists = batch["pids"].to_pylist()
        outs = []
        for pids in pid_lists:
            for pid in pids:
                d = os.path.join(self.exchange_dir, pid)
                files = sorted(f for f in os.listdir(d) if f.endswith(".arrow"))
                tables = [read_ipc_table(os.path.join(d, f)) for f in files]
                data = pa.concat_tables(tables).combine_chunks()
                with open(os.path.join(d, "_label")) as f:
                    raw_pid = f.read()
                outs.append(self.encode_partition(data, raw_pid))
        return pa.concat_tables(outs)
