"""Checkpoint/resume for matchUnique (SURVEY §5.4).

The reference never wrote checkpoints, but its architecture is
restartable by design: the per-read uniqueinfo array is the ONLY state
carried across index blocks (matchUniqueImplementation.cpp:1097), and
blocks are independent given it. Here the analogous state is the
per-batch MatchState plus the (file, shard-pass) cursor; we serialize
both to one .npz after every completed unit, and on restart skip the
completed units (including their index builds) and restore the states.

The fingerprint ties a checkpoint to the exact work decomposition:
config fields that affect results or batching, input file identities,
and the unit/batch counts. A stale or mismatched checkpoint is ignored.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from typing import Dict, List, Optional

import numpy as np

_FIELDS = ("st", "pos", "frag", "fileid", "errs", "score")


def _file_stamp(path: str):
    """(size, mtime_ns) of an input file — editing a file in place while
    keeping its name and read count must invalidate the checkpoint
    (name+count alone aliased a stale checkpoint onto changed data)."""
    try:
        st = os.stat(path)
        return [st.st_size, st.st_mtime_ns]
    except OSError:
        return [0, 0]


def fingerprint(cfg, texts, num_reads: int, num_batches: int,
                cand_cap: int, survivor_cap: int) -> str:
    ident = {
        "cfg": [cfg.seedl, cfg.seedkmax, cfg.totalkmax, cfg.scores,
                cfg.filter_level, cfg.batch_size, cfg.index_shards,
                cfg.similarity, cfg.err, cfg.trans, cfg.gc,
                cfg.gcmut_bias],
        "caps": [cand_cap, survivor_cap],
        "texts": [(t.name, int(t.packed.n)) for t in texts],
        "textfile": _file_stamp(cfg.textfilename),
        "reads": [cfg.patternfilename, num_reads, num_batches],
        "readfile": _file_stamp(cfg.patternfilename),
    }
    return hashlib.sha256(
        json.dumps(ident, sort_keys=True).encode()).hexdigest()


class Checkpoint:
    """Serialize (per-batch MatchState, reduced overflow, unit cursor)."""

    def __init__(self, path: str, fp: str):
        self.path = path
        self.fp = fp

    def load(self) -> Optional[dict]:
        """Returns {units_done, states: [dict], overflow: [array]} or None
        if absent/mismatched."""
        if not self.path or not os.path.exists(self.path):
            return None
        try:
            z = np.load(self.path, allow_pickle=False)
            if str(z["fingerprint"]) != self.fp:
                print("checkpoint fingerprint mismatch; ignoring it",
                      file=sys.stderr)
                return None
            nb = int(z["num_batches"])
            states = []
            overflow = []
            for bi in range(nb):
                states.append({f: z[f"b{bi}_{f}"] for f in _FIELDS})
                overflow.append(z[f"b{bi}_overflow"])
            return {"units_done": int(z["units_done"]),
                    "states": states, "overflow": overflow}
        except Exception as e:   # corrupt file (e.g. killed mid-write)
            print(f"checkpoint unreadable ({e}); ignoring it",
                  file=sys.stderr)
            return None

    def save(self, units_done: int, states: List[dict],
             overflow: List[np.ndarray]) -> None:
        """Atomic write (tmp + rename) so kill -9 mid-save leaves either
        the old or the new checkpoint, never a torn one."""
        if not self.path:
            return
        payload = {"fingerprint": self.fp,
                   "units_done": np.int64(units_done),
                   "num_batches": np.int64(len(states))}
        for bi, (st, of) in enumerate(zip(states, overflow)):
            for f in _FIELDS:
                payload[f"b{bi}_{f}"] = st[f]
            payload[f"b{bi}_overflow"] = of
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as fobj:
            np.savez(fobj, **payload)
        os.replace(tmp, self.path)

    def delete(self) -> None:
        if self.path and os.path.exists(self.path):
            os.remove(self.path)


_HIT_COLS = ("pid", "k", "pos", "fid", "frag", "score", "inv")


class AllCheckpoint:
    """matchAll checkpoint: (accumulated hit columns, per-read overflow,
    unit cursor). Hits of completed units are independent of later units
    (index shards are disjoint window ranges), so resuming replays only
    the unfinished units."""

    def __init__(self, path: str, fp: str):
        self.path = path
        self.fp = fp

    def load(self) -> Optional[dict]:
        if not self.path or not os.path.exists(self.path):
            return None
        try:
            z = np.load(self.path, allow_pickle=False)
            if str(z["fingerprint"]) != self.fp:
                print("checkpoint fingerprint mismatch; ignoring it",
                      file=sys.stderr)
                return None
            return {"units_done": int(z["units_done"]),
                    "overflow": z["overflow"],
                    "cols": tuple(z[f"hit_{c}"] for c in _HIT_COLS)}
        except Exception as e:
            print(f"checkpoint unreadable ({e}); ignoring it",
                  file=sys.stderr)
            return None

    def save(self, units_done: int, overflow: np.ndarray,
             cols: tuple) -> None:
        if not self.path:
            return
        payload = {"fingerprint": self.fp,
                   "units_done": np.int64(units_done),
                   "overflow": overflow}
        for name, col in zip(_HIT_COLS, cols):
            payload[f"hit_{name}"] = col
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as fobj:
            np.savez(fobj, **payload)
        os.replace(tmp, self.path)

    def delete(self) -> None:
        if self.path and os.path.exists(self.path):
            os.remove(self.path)
