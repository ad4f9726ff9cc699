"""Deduplication operators.

The reference's dedups are ALL order-dependent first-wins sequential scans:
row i is kept iff no *previously kept* row collides with it
(/root/reference/dataflow/operators/general_text/filter/hash_deduplicator.py:75-89,
minhash_deduplicator.py:74-86, simhash_deduplicator.py:78). That is a greedy
maximal-independent-set over the collision graph, taken in a global stable
order — here always ``(order key asc)`` with the engine's canonical order key
being ``(conv_id, turn_idx)`` / ``doc_id``.

Parallel re-expression (no driver-side loops):

1. candidate edges  — banding/bucketing self-join (LSH bands, simhash
   sub-keys, chunk hashes, hyperplane buckets). Shuffle keyed on the band
   hash; AQE splits skewed buckets.
2. connected components — iterative min-label propagation on the edge set
   (components of near-dup graphs are tiny; converges in a few rounds;
   lineage cut via localCheckpoint each round).
3. per-component greedy resolve — cogrouped ``applyInPandas``: sort members
   by the order key, keep a member iff it has no edge to an already-kept
   member. Exactly the reference's sequential semantics, but the sequential
   region is one (tiny) component instead of the whole table.

Exact dedup needs none of that: first-wins == min-by-order within the hash
group — a single map-side-combinable aggregation.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1


# ------------------------------------------------------------- exact dedup


def dedup_exact(
    df: DataFrame,
    cols: list[str],
    order_col: str,
    algo: str = "md5",
) -> DataFrame:
    """First-occurrence-wins exact dedup on the hash of ``cols`` joined by
    '\\n' (multi-key form of hash_deduplicator.py:79-82).

    One shuffle on the hash key; ``min_by`` aggregates partially map-side —
    at 100 TB this is the cheapest correct plan (no global sort, no window).
    ``algo``: md5 | sha256 | xxh64 | ccnet (first 16 hex chars of sha1,
    ccnet_deduplicator.py:9-39).
    """
    joined = F.concat_ws("\n", *[F.coalesce(F.col(c), F.lit("")) for c in cols])
    if algo == "md5":
        h = F.md5(joined)
    elif algo == "sha256":
        h = F.sha2(joined, 256)
    elif algo == "xxh64":
        h = F.xxhash64(joined)
    elif algo == "ccnet":
        h = F.substring(F.sha1(joined), 1, 16)
    else:
        raise ValueError(algo)
    tagged = df.withColumn("__h", h)
    winners = tagged.groupBy("__h").agg(
        F.min_by(F.struct(*df.columns), F.col(order_col)).alias("row")
    )
    return winners.select("row.*")


# ----------------------------------------------- first-wins graph resolve


def connected_components(
    edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Min-label propagation over ``edges(src,dst)`` (ids: long).

    Returns DataFrame[id, comp]. Only nodes that appear in an edge are
    labeled — isolated nodes never collide and are kept unconditionally by
    the caller, which keeps this loop's working set proportional to the
    (small) duplicate population, not the corpus.
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    lab = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mind"))
        .select(F.col("src").alias("id"), F.least("src", "mind").alias("comp"))
        .localCheckpoint()
    )
    def one_round(cur):
        nbr = (
            sym.join(cur.withColumnRenamed("id", "dst2"), sym.dst == F.col("dst2"))
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        return cur.join(nbr, cur.id == nbr.src, "left").select(
            cur.id, F.least(cur.comp, F.coalesce("nbr_comp", cur.comp)).alias("comp")
        )

    # two propagation rounds per convergence check: near-dup components are
    # shallow (usually diameter <= 2), so this halves the count-jobs without
    # extra rounds in the common case
    for _ in range(max_iter // 2):
        new_lab = one_round(one_round(lab)).localCheckpoint()
        changed = (
            new_lab.alias("n")
            .join(lab.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        lab = new_lab
        if changed == 0:
            break
    return lab


_RESOLVE_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType(), False), T.StructField("keep", T.BooleanType(), False)]
)


def _greedy_resolve(nodes: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """Greedy MIS in ascending id order — the reference's first-wins scan
    restricted to one collision component."""
    ids = np.sort(nodes["id"].unique())
    adj: dict[int, set[int]] = {}
    for s, d in zip(edges["src"].values, edges["dst"].values):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    kept: set[int] = set()
    out = []
    for i in ids:
        i = int(i)
        ok = not (adj.get(i, set()) & kept)
        if ok:
            kept.add(i)
        out.append((i, ok))
    return pd.DataFrame(out, columns=["id", "keep"])


def first_wins_keep_ids(nodes_with_edges: DataFrame, edges: DataFrame) -> DataFrame:
    """Resolve first-wins over candidate ``edges(src,dst)`` (long ids, where
    the id IS the global order key rank). Returns DataFrame[id, keep] for
    every node that appears in an edge."""
    comp = connected_components(edges)
    n = nodes_with_edges.join(comp, "id").select("comp", "id")
    e = (
        edges.join(comp.withColumnRenamed("id", "src").withColumnRenamed("comp", "c1"), "src")
        .select("c1", "src", "dst")
        .withColumnRenamed("c1", "comp")
    )
    return (
        n.groupBy("comp")
        .cogroup(e.groupBy("comp"))
        .applyInPandas(
            lambda left, right: _greedy_resolve(left, right), schema=_RESOLVE_SCHEMA
        )
    )


def apply_first_wins(
    df: DataFrame, id_col: str, edges: DataFrame, small_graph_threshold: int = 200_000
) -> DataFrame:
    """Filter ``df`` to first-wins survivors given candidate edges over
    ``id_col`` (long order-rank ids). Rows without any edge are kept.

    The edge set is materialized once (it is consumed by the component
    loop AND the resolve join). Greedy MIS in id order over the whole
    graph equals per-component greedy, so when the collision graph is
    small (the overwhelmingly common case — duplicates are a few % of the
    corpus) the component loop is skipped and one task resolves the whole
    graph; the distributed label-propagation path handles the huge-graph
    case."""
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    if n_edges == 0:
        return df
    if n_edges <= small_graph_threshold:
        one = edges.withColumn("__g", F.lit(0))
        verdict = one.groupBy("__g").applyInPandas(
            lambda pdf: _greedy_resolve(
                pd.DataFrame(
                    {"id": np.concatenate([pdf["src"].values, pdf["dst"].values])}
                ),
                pdf,
            ),
            schema=_RESOLVE_SCHEMA,
        )
    else:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        verdict = first_wins_keep_ids(nodes, edges)
    verdict = verdict.select(
        F.col("id").alias("__fw_id"), F.col("keep").alias("__fw_keep")
    )
    return (
        df.join(verdict, df[id_col] == verdict["__fw_id"], "left")
        .filter(F.coalesce(F.col("__fw_keep"), F.lit(True)))
        .drop("__fw_id", "__fw_keep")
    )


def with_order_rank(df: DataFrame, order_cols: list[str], rank_col: str = "__ord") -> DataFrame:
    """Stable dense global order rank (long) over ``order_cols``.

    Uses zipWithIndex-free SQL: row_number over a global sort. The sort is a
    one-off range shuffle; at 100 TB prefer a naturally-ordered key (e.g.
    a monotone (conv_id, turn_idx) encoding) — callers that already hold a
    unique long key (doc_id, vec_id) should pass it directly instead.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(rank_col, F.row_number().over(w).cast("long"))


# ----------------------------------------------------------------- minhash


def _rolling_byte_ngram_hashes(b: bytes, n: int) -> np.ndarray:
    """All distinct byte-n-gram polynomial hashes of b, fully vectorized.

    base 257 > 255 makes the polynomial injective over byte n-grams, and
    for n <= 7 the exact value fits in int64 (255 * sum(257^i) < 2^63) —
    no modulus, no Python loop: one sliding-window matmul.
    """
    if len(b) < n:
        return (
            np.array([zlib.crc32(b)], dtype=np.uint64)
            if b
            else np.array([], dtype=np.uint64)
        )
    if n > 7:  # would overflow int64 — not used by the engine defaults
        raise ValueError("byte-ngram hash supports n <= 7")
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    powers = (257 ** np.arange(n - 1, -1, -1)).astype(np.int64)
    win = np.lib.stride_tricks.sliding_window_view(arr, n)
    return np.unique(win @ powers).astype(np.uint64)


def minhash_signature_udf(num_perm: int = 128, ngram: int = 5, seed: int = 1):
    """Arrow pandas_udf: text → array<long> MinHash signature.

    Engine semantics (pinned): lowercase, whitespace-collapsed text; byte
    5-gram shingle set; universal hashing h_i(x)=(a_i*x+b_i) mod (2^61-1),
    signature[i]=min_x h_i(x). (Reference uses datasketch with the same
    structure: minhash_deduplicator.py:47-55; datasketch is unavailable
    here so permutations are pinned to this seed.)
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm).astype(np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(s: pd.Series) -> pd.Series:
        def sig(v: str):
            norm = " ".join(v.lower().split())
            hv = _rolling_byte_ngram_hashes(norm.encode("utf-8"), ngram)
            if hv.size == 0:
                return [0] * num_perm
            # (S, P) universal hash then column-min — pure numpy
            m = (hv[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            return m.min(axis=0).astype(np.int64).tolist()

        return s.fillna("").map(sig)

    return _udf


def minhash_band_edges(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    seed: int = 1,
) -> DataFrame:
    """Candidate edges: rows sharing any LSH band of the MinHash signature.

    bands=16, rows/band=8 → collision threshold ≈ (1/16)^(1/8) ≈ 0.71 sig
    similarity; the reference's datasketch LSH at threshold .9 treats any
    band collision as a duplicate *without* verification
    (minhash_deduplicator.py:74-86) — we pin the same no-verify semantics.
    """
    rows_per_band = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature_udf(num_perm=num_perm, seed=seed)(F.col(text_col)).alias("sig"),
    )
    band_tbl = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.concat_ws(
                    ":",
                    i.cast("string"),
                    F.xxhash64(F.slice("sig", i * rows_per_band + 1, rows_per_band)).cast(
                        "string"
                    ),
                ),
            )
        ).alias("band"),
    )
    l, r = band_tbl.alias("l"), band_tbl.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("src"), F.col("r.id").alias("dst"))
        .distinct()
    )


def dedup_minhash(
    df: DataFrame,
    order_col: str,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    seed: int = 1,
) -> DataFrame:
    """MinHash-LSH near-dedup, first-wins by ``order_col`` (long)."""
    edges = minhash_band_edges(df, order_col, text_col, num_perm, bands, seed)
    return apply_first_wins(df, order_col, edges)


def shingle_set_udf(ngram: int = 5):
    """text → sorted distinct byte-n-gram hashes (the exact shingle set)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(s: pd.Series) -> pd.Series:
        def sh(v: str):
            norm = " ".join(v.lower().split())
            return _rolling_byte_ngram_hashes(norm.encode("utf-8"), ngram).astype(
                np.int64
            ).tolist()

        return s.fillna("").map(sh)

    return _udf


def dedup_ngram_jaccard(
    df: DataFrame,
    order_col: str,
    text_col: str = "text",
    threshold: float = 0.8,
    ngram: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    seed: int = 1,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dedup: MinHash bands generate candidates,
    each candidate pair is VERIFIED with the true Jaccard of the byte
    n-gram shingle sets (array_intersect/array_union — JVM-side), then
    first-wins. Unlike ``dedup_minhash`` (reference no-verify semantics)
    this has no false positives."""
    sh = df.select(
        F.col(order_col).alias("id"), shingle_set_udf(ngram)(F.col(text_col)).alias("sh")
    ).localCheckpoint()
    cand = minhash_band_edges(df, order_col, text_col, num_perm, bands, seed)
    l = sh.select(F.col("id").alias("src"), F.col("sh").alias("sh_l"))
    r = sh.select(F.col("id").alias("dst"), F.col("sh").alias("sh_r"))
    verified = (
        cand.join(l, "src")
        .join(r, "dst")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_l", "sh_r")).cast("double")
            / F.size(F.array_union("sh_l", "sh_r")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("src", "dst")
    )
    return apply_first_wins(df, order_col, verified)


# ----------------------------------------------------------------- simhash


def simhash_udf(seed: int = 7):
    """64-bit token-weighted SimHash (simhash_deduplicator.py:15-85
    semantics; token hash = crc32(token) | crc32(token+salt)<<32)."""

    @F.pandas_udf(T.LongType())
    def _udf(s: pd.Series) -> pd.Series:
        salt = str(seed).encode()

        def sh(v: str) -> int:
            toks = v.lower().split()
            if not toks:
                return 0
            acc = np.zeros(64, dtype=np.int64)
            for t in toks:
                tb = t.encode("utf-8")
                h = np.uint64(zlib.crc32(tb)) | (np.uint64(zlib.crc32(tb + salt)) << np.uint64(32))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            out = np.uint64(0)
            for i in range(64):
                if acc[i] > 0:
                    out |= np.uint64(1) << np.uint64(i)
            return int(out.astype(np.int64))

        return s.fillna("").map(sh)

    return _udf


def dedup_simhash(
    df: DataFrame,
    order_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 7,
) -> DataFrame:
    """SimHash near-dedup: 4×16-bit band keys → candidates → native
    bit_count(xor) hamming verify ≤ max_hamming → first-wins."""
    sh = df.select(F.col(order_col).alias("id"), simhash_udf(seed)(F.col(text_col)).alias("sh"))
    band_exprs = [
        F.concat_ws(
            ":",
            F.lit(str(j)),
            F.shiftrightunsigned("sh", j * 16).bitwiseAND(F.lit(0xFFFF)).cast("string"),
        )
        for j in range(4)
    ]
    bands = sh.select("id", "sh", F.explode(F.array(*band_exprs)).alias("band"))
    l, r = bands.alias("l"), bands.alias("r")
    edges = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.id") < F.col("r.id")))
        .filter(F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))) <= max_hamming)
        .select(F.col("l.id").alias("src"), F.col("r.id").alias("dst"))
        .distinct()
    )
    return apply_first_wins(df, order_col, edges)


# --------------------------------------------------------- n-gram chunks


def dedup_ngram_chunks(
    df: DataFrame,
    order_col: str,
    text_col: str = "text",
    n_chunks: int = 5,
    diff_size: int = 2,
) -> DataFrame:
    """Chunk-hash near-dedup (ngramhash_deduplicator.py:10-85): split text
    into ``n_chunks`` equal char chunks, md5 each; rows sharing >=
    ``diff_size`` chunk hashes are duplicates; first-wins by order."""
    cc = F.coalesce(F.col(text_col), F.lit(""))
    ln = F.length(cc)
    step = F.greatest((ln / n_chunks).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(n_chunks - 1)),
        lambda i: F.md5(F.substring(cc, i * step + 1, step)),
    )
    # positional chunk match: chunk i of one doc vs chunk i of another
    tbl = df.select(
        F.col(order_col).alias("id"), F.posexplode(chunks).alias("pos", "ch")
    )
    l, r = tbl.alias("l"), tbl.alias("r")
    return apply_first_wins(
        df,
        order_col,
        (
            l.join(
                r,
                (F.col("l.ch") == F.col("r.ch"))
                & (F.col("l.pos") == F.col("r.pos"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .groupBy(F.col("l.id").alias("src"), F.col("r.id").alias("dst"))
            .agg(F.count("*").alias("overlap"))
            .filter(F.col("overlap") >= diff_size)
            .select("src", "dst")
        ),
    )


# ------------------------------------------------------ embedding cosine


def dedup_embedding_cosine(
    df: DataFrame,
    order_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dedup (sem_deduplicator.py:63-161 shape): candidates
    via random-hyperplane LSH buckets, exact cosine verify JVM-side
    (zip_with + aggregate — no Python in the verify), first-wins resolve."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(np.float64)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bucket_udf(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.values)  # (B, dim)
        keys = []
        signs = []
        for t in range(n_tables):
            proj = mat @ planes[t].T > 0  # (B, planes)
            signs.append(proj)
        for i in range(mat.shape[0]):
            ks = []
            for t in range(n_tables):
                bits = "".join("1" if x else "0" for x in signs[t][i])
                ks.append(f"{t}:{bits}")
            keys.append(ks)
        return pd.Series(keys)

    tbl = df.select(
        F.col(order_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(bucket_udf(F.col(vec_col))).alias("bk"),
    )
    l, r = tbl.alias("l"), tbl.alias("r")
    dot = F.aggregate(
        F.zip_with("l.v", "r.v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(f"{side}.v", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    edges = (
        l.join(r, (F.col("l.bk") == F.col("r.bk")) & (F.col("l.id") < F.col("r.id")))
        .withColumn("cos", dot / (norm("l") * norm("r")))
        .filter(F.col("cos") >= threshold)
        .select(F.col("l.id").alias("src"), F.col("r.id").alias("dst"))
        .distinct()
    )
    return apply_first_wins(df, order_col, edges)
