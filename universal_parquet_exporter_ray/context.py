"""DataContext tuning: size shuffle parallelism to the actual cluster.

Ray Data's defaults (``min_parallelism = 200``, 200-way sort shuffles) are
sized for large multi-node clusters; on an N-CPU node they turn every
groupby/sort into 200 reduce tasks of fixed scheduling overhead. We cap the
defaults at ~2×CPUs (never raising them), which cuts seconds of fixed cost
per shuffle at small scale and is the right default at cluster scale too
(Ray recommends ~2 tasks per core). Called lazily by sources.load_table so
it runs once per session, only after the CALLER has initialised Ray."""

from __future__ import annotations

_tuned = False


def tune_for_cluster() -> None:
    global _tuned
    if _tuned:
        return
    try:
        import ray
        from ray.data import DataContext

        if not ray.is_initialized():
            return
        cpus = int(ray.cluster_resources().get("CPU", 8))
        target = max(8, 2 * cpus)
        ctx = DataContext.get_current()
        # read_op_min_num_blocks is the Ray 2.10+ name; touching the old
        # min_parallelism alias logs a deprecation warning on every job
        # (accessing the NEW name has no such side effect, so a plain
        # instance hasattr probe is safe)
        attr = (
            "read_op_min_num_blocks"
            if hasattr(ctx, "read_op_min_num_blocks")
            else "min_parallelism"
        )
        if getattr(ctx, attr, 0) and getattr(ctx, attr) > target:
            setattr(ctx, attr, target)
        if (
            getattr(ctx, "default_hash_shuffle_parallelism", 0)
            and ctx.default_hash_shuffle_parallelism > target
        ):
            ctx.default_hash_shuffle_parallelism = target
        _tuned = True
    except Exception:
        pass
