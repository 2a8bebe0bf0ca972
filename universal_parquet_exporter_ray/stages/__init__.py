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
