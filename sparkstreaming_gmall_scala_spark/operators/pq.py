"""Product-quantization ANN: the memory-bounded similarity-search scale
path (Jégou et al. 2011, the IVF-PQ/faiss family's PQ half).

The existing families bound CANDIDATES (LSH buckets, IVF cells) but
still hold full vectors: at 100 TB of float32 embeddings the scan itself
is the bottleneck. PQ bounds the BYTES: each vector is split into ``m``
subvectors, each quantized to one of ``ksub`` per-subspace centroids, so
a 64-dim float32 vector (256 B) becomes ``m`` uint8 codes (8 B at the
defaults — 32×). Queries score the compressed corpus by ADC (asymmetric
distance computation): one (m × ksub) lookup table per query, then each
corpus vector costs m table lookups instead of a dim-length dot product.

Division of labor (the sanctioned pandas exceptions — this is matmul-
class work):

- ``pq_train``: driver-side numpy Lloyd per subspace over a
  deterministic hash-ordered sample (sample_n × dim floats — tiny; the
  codebook is m·ksub·dsub ≈ 8 KB). No RNG anywhere: seeds are the first
  ``ksub`` distinct subvectors in sample order, ties and empty clusters
  resolve by index — identical codebooks on every run/engine.
- ``pq_encode``: Arrow-batched ``mapInPandas`` over the corpus — one
  vectorized argmin per subspace per batch, zero shuffle; at scale this
  runs once at ingest and the codes table is what you store and scan.
- ``pq_topk``: the query batch (bounded, driver-resident by the same
  contract that lets the exact path broadcast it) turns into numpy ADC
  tables; the codes table streams through ``mapInPandas``, each
  partition emits its local top-k per query, and a final window ranks
  the ≈ partitions × queries × k survivors — the corpus never shuffles.

All PQ math runs on L2-NORMALIZED vectors, so squared L2 = 2 − 2·cos
and the ADC ranking approximates the cosine ranking the exact/LSH/IVF
paths use; scores are reported as approximate cosine (1 − d²/2, 6 dp).
Codes are engine-opaque (numpy argmin), so the catalog entry is
rows-only like the IVF family; recall is pinned against brute force in
tests/test_similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .similarity import _rank_topk


def _normalize(x: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization; zero vectors stay zero."""
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def _residuals(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """x − nearest_centroid(x) per row (argmin ties → lowest index —
    the same tie rule as every quantizer step in this module)."""
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return x - cents[d.argmin(axis=1)]


def pq_train(
    corpus: DataFrame,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    sample_n: int = 2048,
    iters: int = 8,
    id_col: str | None = None,
    centroids: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (each ksub × dsub) on a
    deterministic sample. Returns plain nested lists (JSON-serializable —
    persist next to the codes table the way ivf caches its centroids).

    Pass ``id_col`` (a unique key) whenever the corpus has one: the
    sample orders by ``(hash(vec), id)``, so 32-bit hash ties (duplicate
    vectors always collide; distinct vectors are birthday-probable at
    scale) cannot reorder rows across the ``sample_n`` cutoff between
    runs/partitionings. Without it, ordering among tied hashes is
    engine-dependent and the identical-codebooks contract only holds
    when the corpus is collision-free.

    Pass ``centroids`` (the IVF coarse quantizer) when the codebooks are
    for an IVF-PQ index: training then runs on RESIDUALS (x − nearest
    centroid) — the faiss IndexIVFPQ scheme. On clustered data raw-vector
    codebooks spend their ksub centroids separating clusters the coarse
    quantizer already separates, leaving no precision for within-cell
    ranking (measured: recall@5 0.48 raw vs 0.90+ residual on the
    clustered fixture, tools/gen_recall.py); residuals concentrate near
    zero regardless of which cell a vector came from, so every codeword
    resolves local structure."""
    order = ["_h"] if id_col is None else ["_h", id_col]
    sel = [F.col(vec_col).alias("v")] + (
        [] if id_col is None else [F.col(id_col).alias(id_col)]
    )
    rows = (
        corpus.select(*sel)
        .withColumn("_h", F.hash(F.col("v").cast("array<string>")))
        .orderBy(*order)
        .limit(sample_n)
        .collect()
    )
    x = _normalize(np.array([r["v"] for r in rows], dtype=np.float64))
    if centroids is not None:
        x = _residuals(x, np.asarray(centroids, dtype=np.float64))
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        # deterministic seeding: first ksub DISTINCT subvectors in the
        # hash-ordered sample (distinct, or one duplicated subvector
        # would pin two identical centroids forever)
        seen: set[bytes] = set()
        seeds = []
        for row in xs:
            key = row.tobytes()
            if key not in seen:
                seen.add(key)
                seeds.append(row)
            if len(seeds) == ksub:
                break
        if len(seeds) < ksub:  # degenerate corpus: pad by repetition
            seeds.extend([seeds[i % len(seeds)] for i in range(ksub - len(seeds))])
        cb = np.array(seeds)
        for _ in range(iters):
            # (n, ksub) squared distances; argmin ties → lowest index.
            # Materializing (n, ksub, dsub) diffs was the 8-bit-codebook
            # bottleneck (ksub=256 made pq_train ~10 s of driver numpy);
            # the expansion ||x||² − 2x·c + ||c||² is a (n, dsub)@(dsub,
            # ksub) matmul — same argmin, ~50× less work. ||x||² is
            # dropped: constant per row, argmin-invariant.
            d = (cb * cb).sum(axis=1)[None, :] - 2.0 * (xs @ cb.T)
            assign = d.argmin(axis=1)
            # cluster means without the per-centroid Python loop:
            # bincount counts + index-accumulated sums (np.add.at adds in
            # increasing row order — the same sequential order the masked
            # per-cluster mean used)
            counts = np.bincount(assign, minlength=ksub)
            sums = np.zeros((ksub, dsub), dtype=np.float64)
            np.add.at(sums, assign, xs)
            nonempty = counts > 0
            cb[nonempty] = sums[nonempty] / counts[nonempty, None]
            # empty clusters keep their previous centroid (deterministic)
        books[s] = cb
    return books.tolist()


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """Quantize every corpus vector to its m subspace codes:
    (id, codes array<int>) — the table you persist and ADC-scan. Zero
    shuffle; one vectorized argmin per subspace per Arrow batch."""
    cb = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, _ksub, dsub = cb.shape

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            codes = np.empty((x.shape[0], m), dtype=np.int64)
            for s in range(m):
                xs = x[:, s * dsub : (s + 1) * dsub]
                d = ((xs[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} long, codes array<int>"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    k: int = 5,
    rerank: DataFrame | None = None,
    shortlist: int = 32,
) -> DataFrame:
    """ADC top-k over the compressed corpus: per query one (m × ksub)
    distance table, per corpus vector m lookups. Each partition emits its
    local shortlist per query (``argpartition``), the final window ranks
    the ≈ partitions × |queries| × shortlist survivors — the codes table
    itself never shuffles.

    ``rerank`` (the raw corpus) enables the standard refine stage:
    quantized distances select a ``shortlist`` per query, then ONLY those
    ≈ |queries| × shortlist rows fetch their raw vectors (broadcast-join
    by id — a point-lookup-sized read, not a scan) and exact cosine
    ranks the final k. This is the production PQ shape: the full corpus
    is touched only as codes; raw-vector IO is shortlist-sized. Without
    ``rerank`` the quantized score ranks directly (cheapest, lowest
    recall — codes alone can't separate near-ties)."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("pq_topk needs a non-empty query batch")
    n_short = max(shortlist, k + 1) if rerank is not None else k + 1
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q = _normalize(np.array([r[vec_col] for r in q_rows], dtype=np.float64))
    # tables[j, s, c] = ||q_j,s − cb[s, c]||²
    tables = np.empty((len(q), m, ksub), dtype=np.float64)
    for s in range(m):
        qs = q[:, s * dsub : (s + 1) * dsub]
        tables[:, s, :] = ((qs[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            c = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            # d2[j, i] = Σ_s tables[j, s, c[i, s]]
            d2 = np.zeros((len(q_ids), c.shape[0]), dtype=np.float64)
            for s in range(m):
                d2 += tables[:, s, c[:, s]]
            kk = min(n_short, c.shape[0])
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            out_q, out_n, out_d = [], [], []
            for j in range(len(q_ids)):
                out_q.extend([q_ids[j]] * kk)
                out_n.extend(ids[part[j]])
                out_d.extend(d2[j, part[j]])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "_d2": out_d}
            )

    local = codes.mapInPandas(
        scan, schema="query_id long, neighbor_id long, _d2 double"
    )
    cand = local.filter(F.col("neighbor_id") != F.col("query_id"))
    if rerank is None:
        scored = cand.select(
            "query_id",
            "neighbor_id",
            # approximate cosine from normalized squared L2, 6 dp like
            # every other scorer in the family
            (F.floor((1.0 - F.col("_d2") / 2.0) * 1e6 + 0.5) / 1e6).alias(
                "score"
            ),
        )
        return _rank_topk(scored, k)

    # refine: global shortlist per query by quantized distance, then
    # exact cosine over just those raw vectors (same 6-dp rounding +
    # tiebreak as brute_force_topk, so rank order is engine-stable)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d2").asc(), F.col("neighbor_id")
    )
    short = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_short)
        .select("query_id", "neighbor_id")
    )
    qdf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cvec = rerank.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        cvec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "score",
            F.floor(cosine(F.col("qvec"), F.col("cvec")) * 1e6 + 0.5) / 1e6,
        )
        .select("query_id", "neighbor_id", "score")
    )
    return _rank_topk(scored, k)


def ivf_pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """One pass producing the IVF-PQ index rows (id, cell, codes): coarse
    cell = argmin over the IVF centroids, codes = per-subspace PQ argmin
    over the RESIDUAL (x − centroid[cell], the faiss IndexIVFPQ scheme —
    see pq_train's residual rationale) — both vectorized in the same
    Arrow batch, so building the composed index costs exactly one corpus
    read. Ties resolve to the lowest index on both quantizers (numpy
    argmin), matching the build's own probe. ``codebooks`` must be
    residual-trained (pq_train with ``centroids=``)."""
    cents = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, _ksub, dsub = cb.shape

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cell = d.argmin(axis=1).astype(np.int64)
            r = x - cents[cell]
            codes = np.empty((x.shape[0], m), dtype=np.int64)
            for s in range(m):
                rs = r[:, s * dsub : (s + 1) * dsub]
                ds = ((rs[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = ds.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cell": cell, "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} long, cell long, codes array<int>"
    )


def ivf_pq_topk(
    index: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 3,
    rerank: DataFrame | None = None,
    shortlist: int = 32,
) -> DataFrame:
    """The composed 100 TB ANN shape (faiss IVFPQ): IVF cells bound the
    CANDIDATES (each query scores only its ``nprobe`` nearest cells — a
    partition-pruned read when ``index`` is written partitioned by
    ``cell``), PQ codes bound the BYTES (candidates are scanned as m
    codes via ADC tables, raw vectors untouched), and the optional
    refine stage exact-reranks the shortlist. ``index`` is
    ``ivf_pq_encode``'s output (or a parquet read of its persisted,
    cell-partitioned form).

    Codes are RESIDUAL-encoded (see ivf_pq_encode), so the ADC tables
    are per (query, probed cell): for query q probing cell c the lookup
    is ||(q − centroid_c)_s − cb[s, code]||², which approximates the
    true ||q − x||² because x ≈ centroid_c + decoded residual. Table
    memory is |queries| × nprobe × m × ksub doubles — bounded by the
    same query-batch contract every ANN entry shares (faiss pays this
    identically; its precomputed-tables trick trades it against a
    ⟨centroid, codeword⟩ cache, worthwhile only at ksub ≫ ours)."""
    cents = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("ivf_pq_topk needs a non-empty query batch")
    n_short = max(shortlist, k + 1) if rerank is not None else k + 1
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q = _normalize(np.array([r[vec_col] for r in q_rows], dtype=np.float64))
    dq = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probed = np.argsort(dq, axis=1, kind="stable")[:, :nprobe]  # (nq, nprobe)
    # cell → (query indices probing it, their residual ADC tables)
    by_cell_js: dict[int, list[int]] = {}
    for j in range(len(q_ids)):
        for c in probed[j]:
            by_cell_js.setdefault(int(c), []).append(j)
    cell_tables: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for c, js_list in by_cell_js.items():
        js = np.array(js_list, dtype=np.int64)
        r = q[js] - cents[c][None, :]
        t = np.empty((len(js), m, ksub), dtype=np.float64)
        for s in range(m):
            rs = r[:, s * dsub : (s + 1) * dsub]
            t[:, s, :] = ((rs[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
        cell_tables[c] = (js, t)

    # partition-prunable read: only probed cells are scanned at all
    cells = sorted(cell_tables)
    pruned = index.filter(F.col("cell").isin(cells))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_q, out_n, out_d = [], [], []
            for c, grp in pdf.groupby("cell"):
                entry = cell_tables.get(int(c))
                if entry is None:
                    continue
                js, t = entry
                codes = np.array(grp["codes"].tolist(), dtype=np.int64)
                ids = grp[id_col].to_numpy()
                d2 = np.zeros((len(js), codes.shape[0]), dtype=np.float64)
                for s in range(m):
                    d2 += t[:, s, codes[:, s]]
                kk = min(n_short, codes.shape[0])
                part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                for jj, j in enumerate(js):
                    out_q.extend([q_ids[j]] * kk)
                    out_n.extend(ids[part[jj]])
                    out_d.extend(d2[jj, part[jj]])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "_d2": out_d}
            )

    local = pruned.mapInPandas(
        scan, schema="query_id long, neighbor_id long, _d2 double"
    )
    cand = local.filter(F.col("neighbor_id") != F.col("query_id"))
    if rerank is None:
        scored = cand.select(
            "query_id",
            "neighbor_id",
            (F.floor((1.0 - F.col("_d2") / 2.0) * 1e6 + 0.5) / 1e6).alias(
                "score"
            ),
        )
        return _rank_topk(scored, k)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d2").asc(), F.col("neighbor_id")
    )
    short = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_short)
        .select("query_id", "neighbor_id")
    )
    qdf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cvec = rerank.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        cvec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "score",
            F.floor(cosine(F.col("qvec"), F.col("cvec")) * 1e6 + 0.5) / 1e6,
        )
        .select("query_id", "neighbor_id", "score")
    )
    return _rank_topk(scored, k)
