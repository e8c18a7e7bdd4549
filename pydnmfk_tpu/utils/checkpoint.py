"""Checkpoint/restart for the NMFk pipeline.

Reference: ``utils.Checkpoint`` (pyDNMFk/utils.py:486-536) pickles
``(flag, perturbation, k)`` and PyNMFk.fit resumes the k-loop at the saved k
(pyDNMFk.py:188-196) — per-perturbation state is recorded but never
replayed, so an interrupted k restarts from its first perturbation.

This implementation checkpoints at strictly finer granularity: alongside
(flag, perturbation, k) it stores the RNG seed, completed ensemble batches
persist to per-k ``ensemble_parts/`` files (config-stamped, replayed on
restart — models/nmfk.py, tested by tests/test_ensemble_memory.py), and
when a k completes the per-k results live in results.h5 exactly as in the
reference (which is what makes restart-at-k valid there too).  State is
JSON (human-readable, version-tagged) instead of pickled objects.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

# pipeline-stage flags (reference pyDNMFk.py:165):
FLAG_RUNNING = 0        # inside the perturbation loop
FLAG_PERTS_DONE = 1     # all perturbations factorized
FLAG_CLUSTERED = 2      # clustering finished
FLAG_SAVED = 3          # per-k results written


@dataclasses.dataclass
class CheckpointState:
    flag: int = FLAG_RUNNING
    perturbation: int = 0
    k: int = 0
    seed: int = 0
    version: int = 1


class Checkpoint:
    def __init__(self, results_path: str, enabled: bool = True):
        self.enabled = enabled
        self.path = os.path.join(results_path, "checkpoint.json")
        self.state: Optional[CheckpointState] = None

    def load(self) -> Optional[CheckpointState]:
        if not self.enabled or not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            d = json.load(f)
        self.state = CheckpointState(**{k: d[k] for k in
                                        CheckpointState.__dataclass_fields__
                                        if k in d})
        return self.state

    def save(self, flag: int, perturbation: int, k: int, seed: int = 0):
        if not self.enabled:
            return
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        st = CheckpointState(flag=flag, perturbation=perturbation, k=k,
                             seed=seed)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dataclasses.asdict(st), f)
        os.replace(tmp, self.path)   # atomic, unlike the reference's pickle
        self.state = st

    def resume_k(self, start_k: int, step_k: int) -> int:
        """Starting k after a resume: a k whose results were fully saved
        (flag==FLAG_SAVED) is skipped; an interrupted k is recomputed."""
        st = self.load()
        if st is None or st.k == 0:
            return start_k
        if st.flag >= FLAG_SAVED:
            return st.k + step_k
        return st.k
