"""Round-robin gate rotation: the driver's correctness gate budgets 50
rows, but the catalog holds more oracle-bearing distinct behaviors than
that. Instead of hand-rotating each round (rounds 5 and 6 did, per
verdict), six gate slots alternate mechanically between two pinned sets
so every distinct behavior gets an independent driver CORRECTNESS row at
least once every two rounds.

The round number is inferred from the repo itself: the driver writes
``CORRECTNESS_r{N}.json`` into the repo root after each round's verify,
so at round N's verify exactly N−1 of them exist. Counting files needs
no driver cooperation and is stable under re-runs within a round.

Both sets are all-green against their oracles (in-suite parity at
sf0.001 via tests/test_oracle_parity.py covers whichever set is ungated
this round), so a miscounted round can only shift WHICH green rows the
driver records, never introduce a failure.

Everything not in these two sets keeps its static ``gated`` flag from
registration: sole-representative behaviors stay gated every round;
documented twins/subsets stay ungated (their signal lives in pytest
equality with a gated sibling).
"""

from __future__ import annotations

import glob
import os

# Slot set A (even rounds — first active in round 6, where these six got
# their first driver rows): the round-5 corpus-quality/curation families.
SET_A: tuple[str, ...] = (
    "gopher_quality",
    "token_entropy",
    "line_dedup",
    "corpus_curate",
    "containment_pairs",
    "hourly_event_rollup",
)

# Slot set B (odd rounds — first active in round 7): the remaining
# distinct behaviors without driver rows — classifier scoring, the two
# corpus-assembly manifests, PII masking, and the round-6 single-scan
# curation pair.
SET_B: tuple[str, ...] = (
    "model_score",
    "chunk_tokens",
    "pack_sequences",
    "pii_mask",
    "corpus_features",
    "corpus_curate_fast",
)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def current_round(repo_root: str | None = None) -> int:
    """Round N ⇔ N−1 CORRECTNESS_r*.json files exist at verify time."""
    root = repo_root or _REPO_ROOT
    return len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))) + 1


def active_rotation(repo_root: str | None = None) -> tuple[str, ...]:
    """The six rotating names that are GATED this round."""
    return SET_A if current_round(repo_root) % 2 == 0 else SET_B
