"""Generation-eval scorers: token F1 and sentence BLEU (deterministic).

Reference: F1Scorer (agentic_rag/eval/f1_scorer.py:36-83) — max token-level
F1 of a prediction against gold answers after normalization; BleuScorer
(eval/gen/bleu_scorer.py:9) — sentence BLEU. Both are pure functions of the
two strings → Arrow pandas_udfs; F1 also has a native Catalyst form (the
multiset intersection via arrays) used by the oracle-checked query.
"""

from __future__ import annotations

import math
import re
import string
from collections import Counter
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ARTICLES = re.compile(r"\b(a|an|the)\b")
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def normalize_answer(s: str) -> str:
    """lower → strip punctuation → drop articles → collapse whitespace
    (f1_scorer.py:36-50 normalization chain)."""
    s = (s or "").lower().translate(_PUNCT_TABLE)
    s = _ARTICLES.sub(" ", s)
    return " ".join(s.split())


def token_f1(prediction: str, gold: str) -> float:
    p = normalize_answer(prediction).split()
    g = normalize_answer(gold).split()
    if not p or not g:
        return float(p == g)
    common = Counter(p) & Counter(g)
    overlap = sum(common.values())
    if overlap == 0:
        return 0.0
    precision = overlap / len(p)
    recall = overlap / len(g)
    return 2 * precision * recall / (precision + recall)


def f1_udf():
    @F.pandas_udf(T.DoubleType())
    def _udf(pred: pd.Series, gold: pd.Series) -> pd.Series:
        return pd.Series(
            [token_f1(p, g) for p, g in zip(pred.fillna(""), gold.fillna(""))],
            dtype="float64",
        )

    return _udf


def f1_native(pred: Column, gold: Column) -> Column:
    """Native token-F1: multiset overlap via per-token min counts.

    overlap = Σ_t min(count_p(t), count_g(t)) computed with aggregate over
    the distinct tokens of the prediction."""
    from dataflow_spark.functions.text import PUNCTUATION

    def norm_toks(c: Column) -> Column:
        s = F.translate(F.lower(F.coalesce(c, F.lit(""))), PUNCTUATION, "")
        s = F.regexp_replace(s, r"\b(a|an|the)\b", " ")
        return F.filter(F.split(F.trim(s), r"\s+"), lambda x: x != "")

    p, g = norm_toks(pred), norm_toks(gold)

    def count_in(arr: Column, tok: Column) -> Column:
        return F.size(F.filter(arr, lambda x: x == tok))

    overlap = F.aggregate(
        F.array_distinct(p),
        F.lit(0),
        lambda acc, t: acc + F.least(count_in(p, t), count_in(g, t)),
    )
    np_, ng = F.size(p), F.size(g)
    prec = overlap.cast("double") / np_
    rec = overlap.cast("double") / ng
    return (
        F.when((np_ == 0) | (ng == 0), ((np_ == 0) & (ng == 0)).cast("double"))
        .when(overlap == 0, F.lit(0.0))
        .otherwise(2 * prec * rec / (prec + rec))
    )


def sentence_bleu(candidate: str, reference: str, max_n: int = 4) -> float:
    """Sentence BLEU-4 with +1 smoothing on higher-order n-grams and the
    standard brevity penalty (deterministic; BleuScorer stand-in)."""
    c_toks = (candidate or "").lower().split()
    r_toks = (reference or "").lower().split()
    if not c_toks or not r_toks:
        return 0.0
    log_sum = 0.0
    orders = 0
    for n in range(1, max_n + 1):
        c_ngrams = Counter(
            tuple(c_toks[i : i + n]) for i in range(len(c_toks) - n + 1)
        )
        r_ngrams = Counter(
            tuple(r_toks[i : i + n]) for i in range(len(r_toks) - n + 1)
        )
        total = sum(c_ngrams.values())
        if total == 0:
            break  # candidate shorter than n — use the achievable orders
        match = sum((c_ngrams & r_ngrams).values())
        if n == 1:
            p = match / total
            if p == 0:
                return 0.0
        else:
            p = (match + 1) / (total + 1)  # add-one smoothing
        log_sum += math.log(p)
        orders = n
    if orders == 0:
        return 0.0
    bp = 1.0 if len(c_toks) > len(r_toks) else math.exp(1 - len(r_toks) / len(c_toks))
    return bp * math.exp(log_sum / orders)


def cider_scores(
    df,
    id_col: str = "id",
    cand_col: str = "cand",
    ref_col: str = "ref",
    max_n: int = 4,
    round_to: int | None = 6,
):
    """CIDEr (Vedantam et al., CVPR'15) — TF-IDF-weighted n-gram cosine
    between candidate and reference, averaged over n=1..4, scaled by 10 and
    a length gaussian penalty (sigma=6). Reference: eval/gen/cider_scorer.py:17.

    Corpus-level: the IDF comes from the reference corpus, computed
    distributed (explode n-grams → document frequency). Per-row scoring is
    a vectorized pandas cogroup on the (small) per-document n-gram sets —
    IDF is a broadcast join, the heavy side never leaves the cluster.
    """
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def ngram_explode(col: str, out: str):
        toks = F.split(F.trim(F.lower(F.coalesce(F.col(col), F.lit("")))), r"\s+")

        def gram_at(n: int):
            # closure factory, NOT `lambda i, n=n`: F.transform counts lambda
            # parameters (defaults included) and passes the 0-based array
            # index as the second argument, silently shadowing the default
            return lambda i: F.concat_ws(" ", F.slice(toks, i, n))

        grams = []
        for n in range(1, max_n + 1):
            k = F.size(toks) - (n - 1)
            # NB sequence(1, 0) DESCENDS in Spark — guard k < 1 explicitly
            grams.append(
                F.when(k >= 1, F.transform(F.sequence(F.lit(1), k), gram_at(n)))
                .otherwise(F.array().cast("array<string>"))
            )
        return df.select(
            F.col(id_col).alias("id"), F.explode(F.flatten(F.array(*grams))).alias(out)
        )

    n_docs = df.count()
    # document frequency over the reference corpus
    dfreq = (
        ngram_explode(ref_col, "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
    )
    idf = dfreq.select(
        "gram", F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf")
    )

    cand_tf = ngram_explode(cand_col, "gram").groupBy("id", "gram").agg(
        F.count("*").alias("ctf")
    )
    ref_tf = ngram_explode(ref_col, "gram").groupBy("id", "gram").agg(
        F.count("*").alias("rtf")
    )
    joined = (
        cand_tf.join(ref_tf, ["id", "gram"], "outer")
        .join(F.broadcast(idf), "gram", "left")
        .fillna({"ctf": 0, "rtf": 0, "idf": 0.0})
        .withColumn("n", F.size(F.split("gram", " ")))
    )
    # per (id, n): cosine of tf-idf vectors
    agg = joined.groupBy("id", "n").agg(
        F.sum(F.col("ctf") * F.col("rtf") * F.col("idf") * F.col("idf")).alias("dot"),
        F.sqrt(F.sum(F.col("ctf") * F.col("ctf") * F.col("idf") * F.col("idf"))).alias("cn"),
        F.sqrt(F.sum(F.col("rtf") * F.col("rtf") * F.col("idf") * F.col("idf"))).alias("rn"),
    )
    per_n = agg.withColumn(
        "sim",
        F.when((F.col("cn") > 0) & (F.col("rn") > 0), F.col("dot") / (F.col("cn") * F.col("rn"))).otherwise(0.0),
    )
    lens = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.trim(F.lower(F.coalesce(F.col(cand_col), F.lit("")))), r"\s+")).alias("cl"),
        F.size(F.split(F.trim(F.lower(F.coalesce(F.col(ref_col), F.lit("")))), r"\s+")).alias("rl"),
    )
    out = (
        per_n.groupBy("id")
        .agg((F.sum("sim") / max_n).alias("mean_sim"))
        .join(lens, "id")
        .withColumn(
            "cider",
            10.0
            * F.col("mean_sim")
            * F.exp(-((F.col("cl") - F.col("rl")) ** 2) / F.lit(2 * 6.0**2)),
        )
        .select("id", F.round("cider", round_to).alias("cider") if round_to else F.col("cider"))
    )
    return out


def bleu_udf():
    @F.pandas_udf(T.DoubleType())
    def _udf(cand: pd.Series, ref: pd.Series) -> pd.Series:
        return pd.Series(
            [sentence_bleu(c, r) for c, r in zip(cand.fillna(""), ref.fillna(""))],
            dtype="float64",
        )

    return _udf


# ------------------------------------------------- BERTScore / Task2Vec Δ

@lru_cache(maxsize=65536)
def _token_unit_vector(token: str, dim: int = 64) -> tuple:
    """Component j of a token's raw vector is
    ``int(md5(f"{token}:{j}")[:8], 16) / 2^31 - 1`` (uniform in [-1, 1)),
    then the vector is unit-normalized. md5 arithmetic — not an RNG — so
    a DuckDB oracle can replay it exactly:
    ``('0x' || substr(md5(tok || ':' || j), 1, 8))::BIGINT``."""
    import hashlib

    raw = [
        int(hashlib.md5(f"{token}:{j}".encode("utf-8")).hexdigest()[:8], 16)
        / 2147483648.0
        - 1.0
        for j in range(dim)
    ]
    norm = math.sqrt(sum(x * x for x in raw))
    return tuple(x / norm for x in raw) if norm > 0 else tuple(raw)


def _token_embedding_matrix(tokens: list[str], dim: int = 64):
    """Deterministic per-token unit embeddings derived from md5 component
    hashes (see ``_token_unit_vector``). The model seam for
    BERTScorer/Task2VecScorer (both reference scorers run transformer
    encoders — eval/gen/bertscore_scorer.py,
    eval/statistics/task2vec_scorer.py); swap this function for real
    encoder outputs to recover the reference metrics. Deterministic,
    pinned, identical across executors, and SQL-replayable (the md5
    family makes the downstream scores DuckDB-oracle-checkable)."""
    import numpy as np

    if not tokens:
        return np.zeros((0, dim))
    return np.array([_token_unit_vector(t, dim) for t in tokens])


def bertscore(candidate: str, reference: str, dim: int = 64) -> tuple[float, float, float]:
    """BERTScore-shaped greedy matching (Zhang et al., ICLR'20) over the
    deterministic hashed embeddings: P = mean over candidate tokens of the
    best cosine against any reference token, R symmetric, F harmonic."""
    c = _token_embedding_matrix((candidate or "").lower().split(), dim)
    r = _token_embedding_matrix((reference or "").lower().split(), dim)
    if not len(c) or not len(r):
        return (0.0, 0.0, 0.0)
    sim = c @ r.T
    p = float(sim.max(axis=1).mean())
    rr = float(sim.max(axis=0).mean())
    f = 2 * p * rr / (p + rr) if p + rr > 0 else 0.0
    return (p, rr, f)


def bertscore_udf(dim: int = 64):
    schema = T.StructType(
        [
            T.StructField("precision", T.DoubleType()),
            T.StructField("recall", T.DoubleType()),
            T.StructField("f1", T.DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def _udf(cand: pd.Series, ref: pd.Series) -> pd.DataFrame:
        rows = [bertscore(c, r, dim) for c, r in zip(cand.fillna(""), ref.fillna(""))]
        return pd.DataFrame(rows, columns=["precision", "recall", "f1"])

    return _udf


def doc_embedding_udf(dim: int = 64):
    """text → unit mean-token embedding (the Task2Vec per-sample vector)."""
    import numpy as np

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _udf(s: pd.Series) -> pd.Series:
        def emb(v: str):
            m = _token_embedding_matrix(v.lower().split(), dim)
            if not len(m):
                return [0.0] * dim
            u = m.mean(axis=0)
            n = np.linalg.norm(u)
            return (u / n if n > 0 else u).tolist()

        return s.fillna("").map(emb)

    return _udf


def task2vec_diversity(df, text_col: str = "text", dim: int = 64):
    """Task2Vec diversity coefficient stand-in (Miranda et al.'22 shape:
    1 - mean pairwise cosine of per-sample task embeddings). With unit
    vectors, mean pairwise cosine = (||Σv||² - n) / (n(n-1)) — so the
    whole corpus reduces to ONE d-dim vector sum + a count: a single
    map-side-combinable aggregation, no pairwise join, exact at any scale."""
    # tokenless docs would contribute zero (non-unit) vectors and bias the
    # closed form — they carry no task signal, drop them
    emb = df.filter(F.coalesce(F.col(text_col), F.lit("")).rlike(r"\S")).select(
        doc_embedding_udf(dim)(F.col(text_col)).alias("v")
    )
    agg = emb.select(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at("v", i + 1)).alias(f"s{i}") for i in range(dim)],
    )
    sumsq = sum(F.col(f"s{i}") * F.col(f"s{i}") for i in range(dim))
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.when(
            F.col("n") > 1,
            F.round(1.0 - (sumsq - F.col("n")) / (F.col("n") * (F.col("n") - 1)), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("diversity"),
    )
