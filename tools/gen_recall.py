"""Measure recall@k of every ANN variant against the exact brute-force
baseline and render RECALL.md.

Everything here is deterministic (hash-seeded quantizers, md5 planes, no
RNG), so the table is reproducible bit-for-bit on any host:
``python tools/gen_recall.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all  # noqa: E402
from sparkstreaming_gmall_scala_spark.session import get_spark  # noqa: E402

# Catalog ANN entries to score, with the knob summary shown in the table.
VARIANTS = (
    ("knn_lsh_persisted", "8 hyperplanes, 4 bands, persisted buckets"),
    ("knn_ivf_persisted", "k-means k=4, nprobe=2, persisted cells"),
    ("knn_pq_persisted", "PQ m=8×8-bit, ADC + exact rerank"),
    ("knn_ivf_pq", "IVF k=8 × residual-PQ m=8×8-bit, nprobe=4, built per run"),
    ("knn_ivf_pq_persisted", "same, cell-partitioned persisted index"),
    ("knn_sq8", "SQ8 per-dim uint8, codegen decode + exact rerank"),
    (
        "knn_ivf_sq8",
        "IVF k=8 (directional cells) × residual-SQ8, nprobe=4, "
        "cell-partitioned persisted index",
    ),
    (
        "knn_ivf_probe6",
        "knn_ivf_persisted's index, multi-probe nprobe=6 of 8",
    ),
)

# r15 (r14 verdict #6): the IVF multi-probe recall curve — same
# persisted index, sweeping THE recall/latency knob.
NPROBE_SWEEP = (1, 2, 3, 4, 5, 6, 7, 8)


def ivf_probe_curve(spark, sf_dir: str) -> list[tuple[int, float]]:
    from pyspark.sql import functions as F

    from sparkstreaming_gmall_scala_spark.operators.similarity import (
        ivf_probe,
    )
    from sparkstreaming_gmall_scala_spark.plans.llm import (
        _ivf_persisted_index,
    )

    reg = load_all()
    truth: dict[int, set[int]] = {}
    for r in reg["knn_bruteforce"].builder(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    cell_dir, centroids, e = _ivf_persisted_index(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10)
    out = []
    for nprobe in NPROBE_SWEEP:
        got: dict[int, set[int]] = {}
        for r in ivf_probe(
            q, cell_dir, "vec_id", "embedding", centroids,
            k=5, nprobe=nprobe, dim=64,
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(truth[k] & got.get(k, set())) for k in truth)
        total = sum(len(v) for v in truth.values())
        out.append((nprobe, round(hits / total, 3)))
    return out


def recall_table(spark, sf_dir: str) -> list[tuple[str, str, float, int]]:
    reg = load_all()
    truth: dict[int, set[int]] = {}
    for r in reg["knn_bruteforce"].builder(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rows = []
    for name, desc in VARIANTS:
        got: dict[int, set[int]] = {}
        for r in reg[name].builder(spark, sf_dir).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        total = sum(len(v) for v in truth.values())
        rows.append((name, desc, round(hits / total, 3), total))
    return rows


def render(sf_dir: str) -> str:
    from sparkstreaming_gmall_scala_spark.sources.synth import (
        write_clustered_embeddings,
    )

    clustered_dir = write_clustered_embeddings(
        os.path.join(os.path.sep, "tmp", "spark_graft_clustered_recall")
    )
    spark = get_spark("recall", master="local[8]", shuffle_partitions=8)
    try:
        rows = recall_table(spark, sf_dir)
        crows = recall_table(spark, clustered_dir)
        curve = ivf_probe_curve(spark, sf_dir)
        ccurve = ivf_probe_curve(spark, clustered_dir)
    finally:
        spark.stop()
    sf = os.path.basename(sf_dir.rstrip("/"))
    lines = [
        "# ANN recall vs exact brute force",
        "",
        "recall@5 over the `knn_bruteforce` ground truth "
        "(10 queries × 5 neighbors), on TWO corpora: the driver's "
        f"near-uniform synthetic embeddings at `{sf}`, and a "
        "deterministic mixture-of-Gaussians fixture "
        "(`sources/synth.py`: 4000 vectors, 8 unit-norm centers, "
        "σ=0.15, seed 42) shaped like real embedding corpora. "
        "Deterministic end to end — hash-seeded quantizers, closed-form "
        "planes, seeded fixture, no RNG at query time — so both tables "
        "reproduce exactly via `python tools/gen_recall.py`. The "
        "per-variant floors on both corpora are enforced in "
        "`tests/test_similarity.py` / `tests/test_recall_clustered.py`.",
        "",
        "Reading the numbers: on the near-uniform corpus a pruning index "
        "can't beat its coverage — probing 2 of 4 IVF cells bounds "
        "recall near 0.5 — so the uniform column is a lower bound, not "
        "the operating point. The clustered column is the informative "
        "one: IVF concentrates true neighbors into the probed cells "
        "(recall ≈ 1), and residual-encoded IVF-PQ (faiss IndexIVFPQ "
        "scheme: codes quantize x − centroid, 8-bit codebooks) holds "
        "≈0.9+ at a 32× byte reduction. Raw-vector PQ codes were the "
        "round-7 weak spot on clustered data (0.48 — every codeword "
        "wasted separating clusters the coarse quantizer already "
        "separates); residual training is what recovered it.",
        "",
        "| Variant | Configuration | uniform | clustered |",
        "|---|---|---|---|",
    ]
    for (name, desc, rec, _), (_, _, crec, _) in zip(rows, crows):
        lines.append(f"| `{name}` | {desc} | {rec:.3f} | {crec:.3f} |")
    lines += [
        "",
        "## IVF multi-probe curve",
        "",
        "recall@5 of `ivf_probe` over `knn_ivf_persisted`'s index as "
        "nprobe sweeps 1→8 of the 8 cells — THE IVF recall/latency "
        "knob. On the near-uniform corpus recall tracks coverage "
        "(~nprobe/k, IVF's worst case); on the clustered corpus the "
        "coarse quantizer concentrates true neighbors, so small nprobe "
        "saturates. `knn_ivf_probe6` is the catalog's documented "
        "≥0.85-uniform-recall operating point; probe wall time at bench "
        "SF is flat across the sweep (broadcast-join overhead "
        "dominates), while at 100 TB probe cost scales ~nprobe/k of "
        "the index scan.",
        "",
        "| nprobe | uniform | clustered |",
        "|---|---|---|",
    ]
    for (np_, rec), (_, crec) in zip(curve, ccurve):
        lines.append(f"| {np_} | {rec:.3f} | {crec:.3f} |")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RECALL.md",
    )
    with open(out, "w") as f:
        f.write(render(sf_dir))
    print(f"wrote {out}")
