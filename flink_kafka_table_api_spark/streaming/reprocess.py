"""Selective reprocessing for marker-protocol streaming state (round 8).

Every round-8 streaming pipeline (curation, cdc_apply, ann_ingest,
profile_monitor, temporal_join) follows one state convention under its
`state_dir`:

  commits/batch-N        the exactly-once marker, written LAST
  offsets/batch-N.json   watermark/offset scalars (where applicable)
  state/batch-N          versioned keyed state (where applicable)
  <any>/batch_id=N/      batch-scoped output/index/history partitions
  ckpt/                  the Structured Streaming checkpoint

That convention makes REPROCESSING a first-class operation instead of a
wipe-and-rerun: to re-run the stream from drop K (a fixed bug in batch
logic, a revised quality threshold, a corrupted publish), delete
everything the batches >= K published and their markers, keep everything
before K, and drop the checkpoint. On the next availableNow run the
file-stream replays ALL drops; batches < K hit their markers and no-op
instantly, batches >= K recompute against the surviving prefix state —
the same code path crash recovery already exercises, so reprocessing
needs no second implementation.

At 100 TB this is the difference between "rebuild the corpus" and
"recompute the three bad daily drops": cost is O(reprocessed drops),
and the blast radius is exactly the batch-scoped directories removed.
"""

from __future__ import annotations

import os
import re
import shutil

_BATCH_DIR = re.compile(r"^batch_id=(\d+)$")
_BATCH_FILE = re.compile(r"^batch-(\d+)(\.json)?$")


def reset_from(state_dir: str, batch_id: int) -> dict:
    """Remove every artifact batches >= `batch_id` published under
    `state_dir` (markers, offsets, state versions, batch-scoped
    partition dirs) plus the streaming checkpoint, leaving batches
    < `batch_id` untouched. Returns {kind: n_removed} for auditing."""
    # fail fast, before any deletion: pipelines with a versioned state
    # chain (cdc_apply, temporal_join) fold batch K onto state/batch-K-1,
    # and keep_versions prunes old versions — resetting to a K whose
    # basis was pruned would silently rebase the tail's merge on nothing
    state_d = os.path.join(state_dir, "state")
    if batch_id > 0 and os.path.isdir(state_d):
        have = {e.name for e in os.scandir(state_d)}
        if have and f"batch-{batch_id - 1}" not in have:
            oldest = min(int(n[len("batch-"):]) for n in have)
            raise ValueError(
                f"state/batch-{batch_id - 1} (the merge basis for batch "
                f"{batch_id}) was pruned by the version tail; valid "
                f"resets are 0 (full rebuild) or >= {oldest + 1} (whose "
                "predecessor version survives)"
            )
    removed = {"markers": 0, "offsets": 0, "state": 0,
               "partitions": 0, "checkpoint": 0}
    for sub, kind in (("commits", "markers"), ("offsets", "offsets"),
                      ("state", "state")):
        d = os.path.join(state_dir, sub)
        if not os.path.isdir(d):
            continue
        for e in os.scandir(d):
            m = _BATCH_FILE.match(e.name)
            if m and int(m.group(1)) >= batch_id:
                if e.is_dir():
                    shutil.rmtree(e.path)
                else:
                    os.remove(e.path)
                removed[kind] += 1
    # batch-scoped partition dirs anywhere one level down (out/, hist/,
    # index/, partials/, ...)
    for e in os.scandir(state_dir):
        if not e.is_dir() or e.name in ("commits", "offsets", "state",
                                        "ckpt", "src", "ops", "probes"):
            continue
        for p in os.scandir(e.path):
            m = _BATCH_DIR.match(p.name)
            if m and int(m.group(1)) >= batch_id:
                shutil.rmtree(p.path)
                removed["partitions"] += 1
    ckpt = os.path.join(state_dir, "ckpt")
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
        removed["checkpoint"] = 1
    return removed


__all__ = ["reset_from"]
