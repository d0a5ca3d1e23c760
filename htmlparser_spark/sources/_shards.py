"""Shared shard housekeeping for the one-task-one-shard sinks (WET, JSONL).

Shards are named by partition id, so a re-run of a sink whose input plans
FEWER partitions than the previous run would otherwise leave the previous
run's higher-numbered ``part-NNNNN`` shards in place — a directory-glob
consumer would then see duplicated records (unlike the parquet sinks, which
get idempotency from dynamic partition overwrite). After a sink's action
completes, delete every shard matching its pattern that is not in the
just-collected manifest, plus any ``.tmp`` files abandoned by killed task
attempts (all tasks have finished by the time the manifest is collected,
so a surviving ``.tmp`` is dead weight by construction).

Assumes the driver sees the same (shared) filesystem the executors wrote
to — the same assumption the sinks already make with their driver-side
``os.makedirs``.
"""
from __future__ import annotations

import glob
import os


def gc_stale_shards(out_dir: str, suffix: str, keep: list) -> int:
    """Remove ``part-*{suffix}`` shards not in ``keep`` and stray attempt
    tmp files; return the number of files removed."""
    keep_set = {os.path.abspath(p) for p in keep}
    removed = 0
    for p in glob.glob(os.path.join(out_dir, f"part-*{suffix}*")):
        if p.endswith(".tmp") or os.path.abspath(p) not in keep_set:
            os.remove(p)
            removed += 1
    return removed
