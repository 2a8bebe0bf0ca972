from .encoder import PART_COL, PartitionDecoder, PartitionEncoder  # noqa: F401
from .salting import AssignPartitions, build_salt_map  # noqa: F401

# per-worker-process cache behind task_stage(); one entry per (class, ctor)
_STAGE_CACHE: dict = {}


def task_stage(cls, **ctor):
    """Task-form adapter for a callable-class stage whose __init__ is cheap
    at ANY scale (pure-hash stages: no model, no index, no broadcast table).

    ``map_batches(task_stage(Cls))`` runs as plain tasks on the worker
    processes earlier stages already warmed — an actor pool would pay
    process spawn + imports per actor (~1 s each, measured) to amortize a
    microsecond constructor. The instance is cached per worker process
    keyed by (class, ctor kwargs). Stages with real per-actor setup (media
    decoders, probe indexes, vocab broadcasts, ANN query matrices) must
    stay actor pools: their state is worth amortizing and their kwargs are
    too big to ship per task."""
    key = (cls, tuple(sorted(ctor.items())))

    def fn(batch):
        stage = _STAGE_CACHE.get(key)
        if stage is None:
            stage = _STAGE_CACHE[key] = cls(**ctor)
        return stage(batch)

    fn.__name__ = f"task_{cls.__name__}"
    return fn


def task_stage_obj(cls, **ctor):
    """Task-form adapter for a stage whose ctor payload is SMALL but
    unhashable — numpy broadcast tables (ANN query matrices, IVF
    centroids). The instance is rebuilt per batch, which is valid only
    when ``__init__`` is per-batch-cheap (stores arrays / one tiny
    matmul); unlike ``task_stage`` there is no worker cache, so numpy
    kwargs need no hashing and a worker serving two corpora can never
    reuse a stale instance. Callers MUST size-gate the payload (see
    ``thresholded_stage``): Ray ships the pickled closure to each worker
    once via the GCS function table, so a multi-MB payload belongs in an
    actor pool's by-value constructor kwargs instead."""

    def fn(batch):
        return cls(**ctor)(batch)

    fn.__name__ = f"task_{cls.__name__}"
    return fn


def thresholded_stage(ds, cls, ctor, payload_nbytes: int, concurrency, **mb):
    """Size-thresholded stage form, mirroring ``joins.thresholded_join``:
    run as plain tasks (closure-captured payload, no actor-pool spawn wait
    — ~1 s/actor measured) when the broadcast payload is under
    ``UPXR_TASK_BROADCAST_BUDGET`` (default 4 MiB), else as an actor pool
    that amortizes the by-value payload once per actor. ANN query/centroid
    tables at interactive sizes are KB-scale, so the task form is the
    common case; a 10⁶-query offline matrix stays a pool."""
    import os

    budget = int(os.environ.get("UPXR_TASK_BROADCAST_BUDGET", str(4 << 20)))
    if payload_nbytes <= budget:
        return ds.map_batches(task_stage_obj(cls, **ctor), **mb)
    return ds.map_batches(
        cls, fn_constructor_kwargs=ctor, concurrency=concurrency, **mb
    )
