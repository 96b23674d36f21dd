"""Similarity search over an embedding column (array<float>).

- brute_force_topk: the exact baseline — broadcast the (small) query set
  against the corpus, JVM-side zip_with/aggregate dot products in DOUBLE,
  window top-k. No Python in the loop; at 100 TB the corpus side streams
  through a single scan with the query side broadcast.
- lsh_bucketed_topk: the scale path — random-hyperplane signs bucket both
  sides; only same-bucket pairs are scored (multi-probe via sign-flip
  neighbors). Approximate: recall < 1 by design, so it has no equality
  oracle (driver records the weaker rows-only check).
- embedding_near_pairs: exact near-duplicate pairs (cosine >= tau) via
  block-matrix decomposition + BLAS matmul per block pair (see its
  docstring); the LSH bucketing above is the sub-quadratic approximate path.

Cosine in the top-k/LSH paths is computed in float64 with sequential fold
order (F.aggregate), the same order DuckDB's list_sum uses — keeps the
oracle byte-stable; outputs carry ids (ints), never floats.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F  # noqa: N812

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(df: "DataFrame", emb: str = "embedding") -> "DataFrame":
    dot_self = F.aggregate(
        F.zip_with(_as_double(F.col(emb)), _as_double(F.col(emb)), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # zero-vector guard: norm 0 -> cos = 0/0 = NaN, and NaN sorts LARGEST
    # in Spark, so one zero embedding would become the rank-1 neighbor of
    # every query. With norm clamped to 1, its dot (0) ranks it last.
    return df.withColumn(
        "_norm",
        F.when(dot_self == 0.0, F.lit(1.0)).otherwise(F.sqrt(dot_self)),
    )


def cosine_col(emb_a: str, emb_b: str, norm_a: str, norm_b: str):
    dot = F.aggregate(
        F.zip_with(
            _as_double(F.col(emb_a)), _as_double(F.col(emb_b)), lambda a, b: a * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / (F.col(norm_a) * F.col(norm_b))


def brute_force_topk(
    embeddings: "DataFrame",
    query_ids_below: int = 10,
    k: int = 5,
) -> "DataFrame":
    """Exact top-k cosine neighbors for queries (vec_id < query_ids_below)
    against the rest of the corpus. Output: (query_id, rank, neighbor_id).

    The query side is tiny by construction -> broadcast join, corpus side
    is a single scan. Ties broken by neighbor_id (deterministic)."""
    base = with_norm(embeddings)
    queries = base.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
    )
    corpus = base.filter(F.col("vec_id") >= query_ids_below).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("_norm").alias("c_norm"),
    )
    scored = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "cos", cosine_col("q_emb", "c_emb", "q_norm", "c_norm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("rank").cast("long"),
            F.col("neighbor_id").cast("long"),
        )
    )


def embedding_near_pairs(
    embeddings: "DataFrame",
    tau_times_1000: int = 950,
    num_blocks: int = 8,
) -> "DataFrame":
    """All (id_a < id_b) pairs with cosine >= tau. Output ids only.

    Block-matrix all-pairs: rows are hashed into ``num_blocks`` blocks; each
    row is replicated to every unordered block pair it participates in
    (O(n * B) shuffle), then each block pair is scored as ONE numpy/BLAS
    matrix product inside ``applyInPandas`` (Arrow-batched, no per-row
    Python). This is the canonical exact-all-pairs layout at scale: compute
    is O(n^2 * d / P) spread evenly over P tasks, and a naive JVM cross-join
    with interpreted higher-order-function dot products is ~10x slower.

    Float note: BLAS sums in a different order than a sequential fold, so
    cosines can differ from an exact-fold oracle in the last ulps. Output
    carries ids only; callers must pick tau away from any true pair's cosine
    (our corpus: dups at 1.0, everything else < 0.52).
    """
    import numpy as np
    import pandas as pd

    tau = tau_times_1000 / 1000.0
    pair_keys = F.array_distinct(
        F.array(
            *[
                F.least(F.col("_blk"), F.lit(o)) * num_blocks
                + F.greatest(F.col("_blk"), F.lit(o))
                for o in range(num_blocks)
            ]
        )
    )
    df = (
        embeddings.select("vec_id", "embedding")
        .withColumn("_blk", F.pmod(F.xxhash64("vec_id"), F.lit(num_blocks)))
        .withColumn("_pair", F.explode(pair_keys))
    )

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pair = int(key[0])
        blk_i, blk_j = pair // num_blocks, pair % num_blocks
        left = pdf[pdf["_blk"] == blk_i]
        right = pdf[pdf["_blk"] == blk_j] if blk_j != blk_i else left
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        mat_l = np.stack(left["embedding"].to_numpy()).astype("float64")
        mat_r = np.stack(right["embedding"].to_numpy()).astype("float64")
        # zero-norm clamp (same convention as with_norm/_assign_cells):
        # a zero embedding scores cos 0 everywhere instead of NaN
        nl = np.linalg.norm(mat_l, axis=1, keepdims=True)
        nr = np.linalg.norm(mat_r, axis=1, keepdims=True)
        nl[nl == 0] = 1.0
        nr[nr == 0] = 1.0
        mat_l /= nl
        mat_r /= nr
        sims = mat_l @ mat_r.T
        ids_l = left["vec_id"].to_numpy()
        ids_r = right["vec_id"].to_numpy()
        rr, cc = np.nonzero(sims >= tau)
        raw_a, raw_b = ids_l[rr], ids_r[cc]
        if blk_i == blk_j:
            # same set on both sides: each unordered pair appears twice
            keep = raw_a < raw_b
            ia, ib = raw_a[keep], raw_b[keep]
        else:
            # disjoint blocks: each unordered pair appears exactly once,
            # in whichever orientation — normalize to (min, max)
            ia = np.minimum(raw_a, raw_b)
            ib = np.maximum(raw_a, raw_b)
        return pd.DataFrame({"id_a": ia, "id_b": ib})

    return df.groupBy("_pair").applyInPandas(score, schema="id_a long, id_b long")


# --------------------------------------------------------------------------
# IVF ANN (coarse k-means quantizer + cell-probed search)
# --------------------------------------------------------------------------


def _init_centroids(dim: int, k_cells: int):
    """Deterministic pseudo-random init (md5 bits -> +-1), unit-normalized.
    Wall-clock/RNG-free per the determinism policy."""
    import numpy as np

    cents = np.array(_hyperplanes(dim, k_cells), dtype="float64")
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def _assign_cells(embeddings: "DataFrame", centroids) -> "DataFrame":
    """(vec_id, embedding) -> + cell (nearest centroid by cosine) + _norm.
    One Arrow pass; centroid matrix rides in the closure (broadcast-sized:
    k_cells x dim floats). The norm is computed here anyway for the cosine
    argmax — yielding it saves downstream callers a join back to the
    corpus."""
    import numpy as np
    import pandas as pd

    cent = centroids  # (k, dim), unit rows

    def assign(batches):
        for batch in batches:
            mat = np.stack(batch["embedding"].to_numpy()).astype("float64")
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            cells = np.argmax((mat / norms) @ cent.T, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].to_numpy(),
                    "embedding": batch["embedding"].to_numpy(),
                    "cell": cells.astype("int64"),
                    "_norm": norms[:, 0],
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign,
        schema="vec_id long, embedding array<float>, cell long, _norm double",
    )


def ivf_train_centroids(
    embeddings: "DataFrame", dim: int, k_cells: int = 16, iters: int = 2
):
    """Distributed Lloyd iterations: assign (Arrow matmul) -> per-batch
    PARTIAL sums (map-side combine) -> tiny groupBy(cell) reduce -> driver
    update. Shuffle per iteration is O(batches * k_cells) partial rows, not
    O(n) vectors — the scale-correct layout."""
    import numpy as np
    import pandas as pd

    cent = _init_centroids(dim, k_cells)
    for _ in range(iters):
        assigned = _assign_cells(embeddings, cent)

        def partials(batches):
            for batch in batches:
                mat = np.stack(batch["embedding"].to_numpy()).astype("float64")
                cells = batch["cell"].to_numpy()
                rows = []
                for c in np.unique(cells):
                    sel = mat[cells == c]
                    rows.append(
                        {
                            "cell": int(c),
                            "vec_sum": sel.sum(axis=0),
                            "n": len(sel),
                        }
                    )
                yield pd.DataFrame(rows, columns=["cell", "vec_sum", "n"])

        part = assigned.mapInPandas(
            partials, schema="cell long, vec_sum array<double>, n long"
        )

        def reduce_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
            total = np.stack(pdf["vec_sum"].to_numpy()).sum(axis=0)
            return pd.DataFrame(
                [{"cell": int(key[0]), "vec_sum": total, "n": int(pdf["n"].sum())}]
            )

        stats = (
            part.groupBy("cell")
            .applyInPandas(
                reduce_cell, schema="cell long, vec_sum array<double>, n long"
            )
            .collect()
        )
        new_cent = cent.copy()
        for r in stats:
            if r["n"] > 0:
                mean = np.array(r["vec_sum"], dtype="float64") / r["n"]
                nrm = np.linalg.norm(mean)
                if nrm > 0:
                    new_cent[r["cell"]] = mean / nrm
        cent = new_cent
    return cent


def ivf_topk(
    embeddings: "DataFrame",
    dim: int,
    query_ids_below: int = 10,
    k: int = 5,
    k_cells: int = 16,
    nprobe: int = 4,
    iters: int = 2,
) -> "DataFrame":
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell; each query scores only its ``nprobe`` nearest cells (~nprobe/
    k_cells of the corpus). Approximate by design -> rows-only oracle.

    At scale: centroids are a broadcast closure, the cell column is a
    partition/cluster key, and the probe join is cell-local — the same
    inverted-file layout FAISS IVF uses, expressed as DataFrame ops.
    """
    import numpy as np
    import pandas as pd

    cent = ivf_train_centroids(embeddings, dim, k_cells, iters)
    corpus = _assign_cells(
        embeddings.filter(F.col("vec_id") >= query_ids_below), cent
    )
    queries = embeddings.filter(F.col("vec_id") < query_ids_below)

    def probe(batches):
        for batch in batches:
            mat = np.stack(batch["embedding"].to_numpy()).astype("float64")
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ cent.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            rows = []
            for qid, emb, nrm, cells in zip(
                batch["query_id"].to_numpy(),
                batch["embedding"].to_numpy(),
                norms[:, 0],
                top,
            ):
                for c in cells:
                    rows.append(
                        {
                            "query_id": int(qid),
                            "q_emb": emb,
                            "q_norm": float(nrm),
                            "cell": int(c),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["query_id", "q_emb", "q_norm", "cell"]
            )

    probes = queries.select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).mapInPandas(
        probe,
        schema="query_id long, q_emb array<float>, q_norm double, cell long",
    )

    scored = corpus.withColumnRenamed("vec_id", "neighbor_id").join(
        F.broadcast(probes), "cell"
    ).withColumn(
        "cos",
        cosine_col("q_emb", "embedding", "q_norm", "_norm"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("query_id", "neighbor_id", "cos")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("rank").cast("long"),
            F.col("neighbor_id").cast("long"),
        )
    )


# --------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path; approximate by design)
# --------------------------------------------------------------------------

# Default 6 planes (64 buckets). The accuracy/cost dial is the multiprobe
# radius: radius r probes sum_{i<=r} C(6,i) of the 64 buckets. Measured on
# the sandbox's near-orthogonal synthetic vectors (hardest case — top-1
# cosine ~0.5): radius 1 -> recall 0.16 (~11% scanned), radius 2 -> 0.62
# (~34%), radius 3 -> 0.80 (~66%). On a CLUSTERED corpus (the realistic
# regime; 8 gaussian clusters, noise sigma=0.6 of center scale): radius 1
# -> 0.94, radius 2 -> 1.00 — gated at >= 0.8 by
# tests/test_similarity.py::test_lsh_recall_gate_clustered (IVF likewise
# measures 1.00 at the default nprobe=4/16, gated at >= 0.8). Default
# radius 2.
N_PLANES = 6


def _hyperplanes(dim: int, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random +-1 hyperplanes from md5 bits (seedless
    wall-clock-free construction per the determinism policy)."""
    planes = []
    for p in range(n_planes):
        row: list[float] = []
        need = dim
        counter = 0
        while need > 0:
            digest = hashlib.md5(f"plane:{p}:{counter}".encode()).digest()
            for byte in digest:
                for bit in range(8):
                    if need == 0:
                        break
                    row.append(1.0 if (byte >> bit) & 1 else -1.0)
                    need -= 1
            counter += 1
        planes.append(row)
    return planes


def _sign_bucket(emb_col, planes: list[list[float]]):
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                _as_double(emb_col),
                F.array(*[F.lit(v) for v in plane]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    embeddings: "DataFrame",
    dim: int,
    query_ids_below: int = 10,
    k: int = 5,
    multiprobe_flips: int = 2,
) -> "DataFrame":
    """Approximate top-k: score only corpus vectors whose sign-bucket matches
    the query's bucket or any 1-bit flip of it (multi-probe). At 100 TB the
    bucket column is a cheap partition/cluster key; the join is bucket-local
    instead of all-pairs."""
    import itertools

    planes = _hyperplanes(dim)
    base = with_norm(embeddings).withColumn(
        "bucket", _sign_bucket(F.col("embedding"), planes)
    )
    queries = base.filter(F.col("vec_id") < query_ids_below)
    # probe masks: the bucket itself plus every <= multiprobe_flips-bit
    # flip — the advertised recall/cost dial (radius r probes
    # sum_{i<=r} C(N_PLANES, i) buckets)
    masks = [0] + [
        sum(1 << j for j in combo)
        for r in range(1, multiprobe_flips + 1)
        for combo in itertools.combinations(range(N_PLANES), r)
    ]
    probe_buckets = F.array(
        *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
    )
    queries = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
        F.explode(probe_buckets).alias("bucket"),
    )
    corpus = base.filter(F.col("vec_id") >= query_ids_below).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("_norm").alias("c_norm"),
        "bucket",
    )
    scored = corpus.join(F.broadcast(queries), "bucket").withColumn(
        "cos", cosine_col("q_emb", "c_emb", "q_norm", "c_norm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("query_id", "neighbor_id", "cos")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("rank").cast("long"),
            F.col("neighbor_id").cast("long"),
        )
    )
