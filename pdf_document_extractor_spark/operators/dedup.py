"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point of each variant):

- exact_dedup: one hash-groupBy shuffle on md5(text) — the cheapest possible
  full-corpus dedup; AQE coalesces post-shuffle partitions.
- ngram_jaccard_pairs: exact all-pairs similarity via a shingle-inverted
  index (explode -> self-join on shingle -> per-pair intersection counts).
  Quadratic in the worst case — correct baseline, used as the verifier.
- minhash_lsh_pairs: the scale path. K=32 minhash signatures, banded 16x2;
  candidate pairs only where a band bucket collides, then EXACT Jaccard
  verification of candidates. Output = verified pairs, so results equal the
  brute-force oracle while touching ~O(n) + collisions instead of O(n^2)
  (miss probability at s>=0.8 is (1-s^2)^16 <= 8.3e-8).
- simhash64: 60-bit sign-sum fingerprint; near-dup candidates = small
  Hamming distance (bucketable by 4x15-bit chunks at scale).

All thresholds compare with integer arithmetic (100*inter >= tau*union) —
float-free, byte-stable against the DuckDB oracles.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import functions as F  # noqa: N812

from ..functions.text import h64, tokens

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# MinHash parameters (fixed seed — Spark-side only; the oracle checks the
# VERIFIED output, which is exact Jaccard and parameter-free).
MINHASH_K = 32
LSH_BANDS = 16
LSH_ROWS = 2
_MH_PRIME = 2_147_483_647  # 2^31 - 1
_mh_rng = random.Random(7)
MH_A = [_mh_rng.randrange(1, _MH_PRIME) for _ in range(MINHASH_K)]
MH_B = [_mh_rng.randrange(0, _MH_PRIME) for _ in range(MINHASH_K)]


def exact_dedup(docs: "DataFrame", key_col: str = "text") -> "DataFrame":
    """Keep min(doc_id) per identical text: (text_md5, keeper_id, dup_count)."""
    return (
        docs.groupBy(F.md5(F.col(key_col)).alias("text_md5"))
        .agg(
            F.min("doc_id").cast("long").alias("keeper_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


def _shingle_base(docs: "DataFrame", n: int):
    """(filtered base frame, shingle-set Column): tokens projected once,
    docs with no n-gram dropped, plus the DISTINCT-per-doc shingle-set
    expression over them. array_distinct per row replaces the old global
    ``.distinct()`` — the (doc_id, shingle) pairs are unique by
    construction once the per-doc list is deduped, so the corpus-wide
    distinct was a pure-overhead full shuffle of the exploded shingle
    stream (guide §2.4: "a distinct on data that is already unique").
    Guarded against short docs (sequence() is descending for
    stop<start, so clamp first)."""
    toks = tokens(F.col("text"))
    df = docs.select("doc_id", toks.alias("toks")).withColumn(
        "n_sh", F.greatest(F.size("toks") - F.lit(n - 1), F.lit(0))
    )
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("n_sh")),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, n)),
        )
    )
    return df.filter(F.col("n_sh") > 0), sh


def shingles(docs: "DataFrame", n: int = 3) -> "DataFrame":
    """(doc_id, shingle) distinct word n-grams (exploded row form).

    The generator explodes the shingle expression DIRECTLY: aliasing the
    array in an intermediate projection lets the optimizer infer a
    ``size(arr) > 0`` filter from the Generate and push the whole
    (expensive) array expression below the spread Exchange — evaluating
    the shingle construction twice, once single-threaded (measured ~8x
    on the sf0.1 corpus)."""
    base, sh = _shingle_base(docs, n)
    return base.select("doc_id", F.explode(sh).alias("shingle"))


def shingle_structs(docs: "DataFrame", n: int = 3) -> "DataFrame":
    """(doc_id, shingle, sh_size) exploded rows, one narrow pass.

    The set size rides every exploded row so downstream pair scoring never
    re-derives it (no groupBy(doc_id), no size joins). The set is
    evaluated exactly ONCE per row via lambda binding — wrapping the
    expensive array in ``F.array(...)`` and referencing it through the
    transform's bound variable is the supported way to share one
    evaluation across several consuming subexpressions (a plain column
    alias gets substituted into every consumer by the optimizer)."""
    base, sh = _shingle_base(docs, n)
    wrapped = F.flatten(
        F.transform(
            F.array(sh),  # bind the set once; `arr` below is a variable
            lambda arr: F.transform(
                arr,
                lambda s: F.struct(
                    s.alias("shingle"), F.size(arr).alias("sh_size")
                ),
            ),
        )
    )
    return base.select("doc_id", F.explode(wrapped).alias("w")).select(
        "doc_id",
        F.col("w.shingle").alias("shingle"),
        F.col("w.sh_size").alias("sh_size"),
    )


def _pair_jaccard(
    sh: "DataFrame", candidates: "DataFrame" = None
) -> "DataFrame":
    """Exact per-pair intersection/union counts from a (doc_id, shingle,
    sh_size) frame (see :func:`shingle_structs`); optionally restricted
    to candidate (id_a, id_b) pairs.

    Set sizes ride the exploded rows and the pair groupBy key instead of
    being re-derived by a groupBy(doc_id) + two joins — the old shape
    paid three extra exchanges to recompute a value that is a narrow
    per-row expression of the source (guide §2.4)."""
    src = sh
    if candidates is None:
        # pre-shuffle the shingle stream by the join key ONCE and rename
        # per side AFTER the exchange: both self-join branches then hang
        # off the same exchange (runtime stage reuse), so the shingle
        # construction + shuffle write happen once instead of per side.
        # This is the exchange the join required anyway — not an extra.
        src = sh.repartition(F.col("shingle"))
    a = src.select(
        F.col("doc_id").alias("id_a"),
        "shingle",
        F.col("sh_size").alias("size_a"),
    )
    b = src.select(
        F.col("doc_id").alias("id_b"),
        "shingle",
        F.col("sh_size").alias("size_b"),
    )
    if candidates is not None:
        # Expand ONLY candidate pairs: (id_a,id_b) x a's shingles, matched
        # against b's shingles. Cost is O(|candidates| * shingles/doc), not
        # the O(sum_s df(s)^2) full inverted-index self-join — this is what
        # makes LSH a win over the brute path at scale.
        # Enforce the pair invariant here rather than trusting callers:
        # self-pairs would score jaccard=1, duplicates would double counts.
        candidates = candidates.filter(
            F.col("id_a") < F.col("id_b")
        ).distinct()
        inter = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b", "size_a", "size_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        # shuffled-hash over sort-merge for the inverted-index self-join
        # (guide §3.1): both sides are the same size, neither sorts, and
        # the hash build avoids two full sorts of the shingle stream
        # (measured ~1.5x on the sf0.1 corpus). This exact all-pairs
        # branch is the documented VERIFIER, not the 100-TB scale path
        # (minhash_lsh_pairs is); a skewed-hot-shingle build partition
        # would need the max_df guard long before it OOMs a hash table.
        inter = (
            a.join(b.hint("shuffle_hash"), "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "size_a", "size_b")
            .agg(F.count("*").alias("inter"))
        )
    return inter.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("inter").cast("long"),
        F.col("size_a").cast("long"),
        F.col("size_b").cast("long"),
    )


def ngram_jaccard_pairs(
    docs: "DataFrame", tau_pct: int = 80, n: int = 3,
    max_df: int | None = None,
) -> "DataFrame":
    """Exact n-gram Jaccard near-dup pairs: jaccard >= tau_pct/100, compared
    as 100*inter >= tau_pct*(size_a+size_b-inter) (integer exact).

    ``max_df``: the inverted-index self-join is O(sum_s df(s)^2) — one
    boilerplate shingle shared by 10^6 docs explodes it at 100 TB. Setting
    max_df drops shingles with document frequency > max_df from the JOIN
    side only (a standard near-dup mitigation: ubiquitous shingles carry
    no pair signal, they only connect everything to everything). Sizes and
    intersections then both count the surviving shingles, so the estimate
    stays internally consistent. Default None = exact (the oracle path)."""
    sh = shingle_structs(docs, n)
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        kept = sh.join(F.broadcast(hot), "shingle", "left_anti")
        # recount sizes so they cover SURVIVING shingles only (the
        # carried sh_size includes dropped hot shingles)
        sizes = kept.groupBy("doc_id").agg(
            F.count("*").alias("_kept_size")
        )
        sh = kept.drop("sh_size").join(sizes, "doc_id").withColumnRenamed(
            "_kept_size", "sh_size"
        )
    pairs = _pair_jaccard(sh)
    return pairs.filter(
        100 * F.col("inter")
        >= tau_pct * (F.col("size_a") + F.col("size_b") - F.col("inter"))
    )


def minhash_signatures(sh: "DataFrame") -> "DataFrame":
    """(doc_id, mh_0..mh_{K-1}): min over shingles of (a*h64+b) mod P.
    One shuffle (groupBy doc_id); all K mins computed map-side first.
    Reference implementation over exploded (doc_id, shingle) rows — the
    LSH hot path fuses signatures straight into band keys instead (see
    :func:`minhash_lsh_pairs`)."""
    # reduce the 60-bit hash mod P first so a*h stays < 2^62 (ANSI-safe)
    hcol = h64(F.col("shingle")) % F.lit(_MH_PRIME)
    aggs = [
        F.min((F.lit(MH_A[j]) * hcol + F.lit(MH_B[j])) % F.lit(_MH_PRIME)).alias(
            f"mh_{j}"
        )
        for j in range(MINHASH_K)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: "DataFrame", tau_pct: int = 80, n: int = 3
) -> "DataFrame":
    """MinHash+LSH candidate generation + exact verification (see module
    docstring). Output schema/semantics identical to ngram_jaccard_pairs.

    Band keys are built in ONE narrow expression per doc: shingle set ->
    h64 hash array (bound once via lambda binding, so the md5 work is
    not re-evaluated per band) -> per-band array_min of the K affine
    transforms -> exploded (band, key) rows. Zero shuffles before the
    band self-join; the old shape exploded shingles and paid a
    groupBy(doc_id) exchange just to reassemble per-doc state."""
    prime = F.lit(_MH_PRIME)
    base, sh = _shingle_base(docs, n)

    def _mh_min(hsa, j: int):
        aj, bj = F.lit(MH_A[j]), F.lit(MH_B[j])
        return F.array_min(
            F.transform(hsa, lambda h: (aj * h + bj) % prime)
        ).cast("string")

    def _band_structs(hsa):
        return F.array(
            *[
                F.struct(
                    F.lit(band).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            _mh_min(hsa, band * LSH_ROWS + r)
                            for r in range(LSH_ROWS)
                        ],
                    ).alias("key"),
                )
                for band in range(LSH_BANDS)
            ]
        )

    bands_expr = F.element_at(
        F.transform(
            F.array(F.transform(sh, lambda s: h64(s) % prime)),
            _band_structs,
        ),
        1,
    )
    bands = base.select(
        "doc_id", F.explode(bands_expr).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = bands.select(F.col("doc_id").alias("id_a"), "band", "key")
    right = bands.select(F.col("doc_id").alias("id_b"), "band", "key")
    candidates = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    verified = _pair_jaccard(shingle_structs(docs, n), candidates)
    return verified.filter(
        100 * F.col("inter")
        >= tau_pct * (F.col("size_a") + F.col("size_b") - F.col("inter"))
    )


def dedup_clusters(pairs: "DataFrame", max_iter: int = 20) -> "DataFrame":
    """Near-dup pairs -> connected components: (doc_id, cluster_id) where
    cluster_id = min doc_id in the component (the canonical keeper).

    Pair output alone under-deduplicates: A~B and B~C must collapse to ONE
    keeper even when A~C missed the threshold. Min-label propagation with
    POINTER JUMPING: each round every node takes the min label over
    (itself, its neighbors), then label <- label(label) — the path-halving
    step that makes rounds O(log diameter) instead of O(diameter). Every
    round moves only (long, long) rows — no text.

    Cost discipline (the 100-TB shape AND the bench win):
    - ``sym`` is localCheckpoint'ed ONCE: without it, every action of every
      round replays the upstream edge plan (for near-dup input that is the
      whole shingle inverted-index join — the single biggest cost of the
      old loop).
    - one action per round: the changed-count rides the checkpointed frame
      as a flag column, so convergence detection is a count over already-
      materialized partitions, not a second derivation.
    """
    edges = pairs.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )
    # Materialize the (possibly very expensive) upstream edge plan ONCE,
    # then symmetrize from the checkpointed rows: a union of the edge
    # plan with its own swap executes that plan twice (for near-dup
    # input that is the whole shingle inverted-index join — measured 2x
    # the edge-derivation wall before this split).
    half = edges.localCheckpoint(eager=True)
    sym = (
        half.unionByName(
            half.select(
                F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)  # edges are re-joined every round
    )
    # Label init fused with the FIRST neighbor-min propagation: the
    # groupBy(id_a) subsumes the old distinct() (same single exchange)
    # and seeds label = min(id, min neighbor id), which is exactly what
    # round 1's propagate half would compute from identity labels — one
    # full loop round saved for free.
    labels = (
        sym.groupBy("id_a")
        .agg(F.min("id_b").alias("_nb"))
        .select(
            F.col("id_a").alias("id"),
            F.least(F.col("id_a"), F.col("_nb")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["id_b"] == labels["id"])
            .groupBy("id_a")
            .agg(F.min("label").alias("neighbor_label"))
        )
        prop = (
            labels.join(
                neighbor_min, labels["id"] == neighbor_min["id_a"], "left"
            )
            .select(
                labels["id"],
                F.least(
                    labels["label"],
                    F.coalesce("neighbor_label", labels["label"]),
                ).alias("label"),
                labels["label"].alias("_old"),
            )
            # both sides of the pointer-jump self-join below reference this
            # plan: without a cache the propagation shuffle runs TWICE per
            # round (persist is lazy — still one action per round)
            .persist()
        )
        # pointer jump: label <- min(label, label's current label). Labels
        # are node ids, so every label has a row; left join for safety.
        jumped = (
            prop.alias("a")
            .join(
                prop.select(
                    F.col("id").alias("_jid"), F.col("label").alias("_jlabel")
                ).alias("b"),
                F.col("a.label") == F.col("b._jid"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.least(
                    F.col("a.label"),
                    F.coalesce(F.col("b._jlabel"), F.col("a.label")),
                ).alias("label"),
                (
                    F.least(
                        F.col("a.label"),
                        F.coalesce(F.col("b._jlabel"), F.col("a.label")),
                    )
                    != F.col("a._old")
                ).alias("_changed"),
            )
        )
        # LAZY checkpoint + count: the convergence count IS the action
        # that materializes (and lineage-truncates) this round's labels,
        # so each round runs ONE job instead of an eager-checkpoint job
        # followed by a count job. prop must stay cached until the count
        # has executed the self-join through it.
        new_labels = jumped.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("_changed")).count()
        prop.unpersist()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently returning partial labels would under-deduplicate with
        # no signal; a >max_iter-diameter component is a data smell the
        # caller must see (raise max_iter, or pre-split giant components)
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds — a "
            f"component has diameter > {max_iter}"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 60  # h64 is a 60-bit hash (15 hex chars)


def simhash64(docs: "DataFrame") -> "DataFrame":
    """(doc_id, simhash): bit j set iff sum over tokens of (2*bit_j(h)-1) > 0.

    Token hashing uses the cross-engine md5-prefix h64, computed in an
    Arrow-batched mapInPandas (the 60-way bit unpack is cheaper in numpy
    than as 60 Catalyst aggregates; still no per-row Python UDFs).
    """
    import hashlib

    import numpy as np

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
        # token -> 60-bit hash memo, task-lifetime: corpus vocabulary
        # repeats heavily across documents, so each distinct token is
        # md5-hashed once per task instead of once per occurrence
        # (guide §4.5 heavyweight-state amortization; values unchanged)
        memo: dict[str, int] = {}

        def h(t: str) -> int:
            v = memo.get(t)
            if v is None:
                v = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                memo[t] = v
            return v

        for batch in batches:
            out_ids = []
            out_hashes = []
            for doc_id, text in zip(
                batch["doc_id"].to_numpy(), batch["text"].to_numpy()
            ):
                toks = str(text).split()
                if not toks:
                    out_ids.append(doc_id)
                    out_hashes.append(0)
                    continue
                hs = np.fromiter(
                    (h(t) for t in toks), dtype=np.uint64, count=len(toks)
                )
                bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
                votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
                sim = int(((votes > 0).astype(np.uint64) << shifts).sum())
                out_ids.append(doc_id)
                out_hashes.append(sim)
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_hashes})

    return docs.select("doc_id", "text").mapInPandas(
        batch_fn, schema="doc_id long, simhash long"
    )


def simhash_near_pairs(docs: "DataFrame", max_hamming: int = 3) -> "DataFrame":
    """Near-dup pairs by simhash Hamming distance. Scale path: band the 60
    bits into 4 x 15-bit chunks (pigeonhole: distance<=3 pairs share at
    least one exact chunk), join per chunk, verify distance."""
    sim = simhash64(docs)
    chunks = []
    for c in range(4):
        chunks.append(
            F.struct(
                F.lit(c).alias("chunk"),
                (
                    F.shiftright(F.col("simhash"), c * 15) % F.lit(1 << 15)
                ).alias("key"),
            )
        )
    banded = sim.select(
        "doc_id", "simhash", F.explode(F.array(*chunks)).alias("ck")
    ).select(
        "doc_id", "simhash",
        F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sim_a"),
        "chunk", "key",
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sim_b"),
        "chunk", "key",
    )
    cand = (
        a.join(b, ["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.filter(ham <= max_hamming).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        ham.cast("long").alias("hamming"),
    )
