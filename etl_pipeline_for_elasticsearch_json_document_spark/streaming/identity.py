"""Checkpoint-lineage identity for at-least-once replay ledgers.

foreachBatch epoch ids are only monotone WITHIN one checkpoint lineage: a
fresh checkpoint over the same state/output restarts epochs at 0, so any
ledger keyed on the epoch alone would treat genuinely new data in batches
0..N as a replay and silently skip it (data loss). Every replay ledger in
this package (sketch_job state, export_job audit rows, epoch-named output
dirs) therefore pairs the epoch with this lineage id and only skips when
BOTH match — a crash replay (same checkpoint, re-delivered epoch) is
skipped; a new lineage merges/writes under its own key.
"""

from __future__ import annotations

import hashlib
import os


def checkpoint_identity(checkpoint_dir: str) -> str:
    """Stable 16-hex identity of a checkpoint lineage (path-derived: one
    checkpoint directory == one offset/commit log == one epoch sequence)."""
    return hashlib.sha256(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:16]
