"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side expressions over the canonical
tokenizer — one explode + one agg shuffle each.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles
from ..textnorm import spark_tokens

# marker stopwords per language, canonical-tokenizer form (uppercase).
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["THE", "AND", "OF", "IS", "IN", "TO"],
    "de": ["DER", "DIE", "UND", "IST", "DAS", "EIN"],
    "fr": ["LE", "LA", "ET", "EST", "UN", "UNE"],
    "es": ["EL", "LA", "Y", "ES", "UN", "UNA"],
}
LANG_ORDER = ["en", "de", "fr", "es"]

EN_STOPWORDS = [
    "THE", "OF", "AND", "TO", "IN", "A", "IS", "THAT", "FOR", "IT",
    "WAS", "ON", "WITH", "AS", "BY", "AT", "FROM", "ARE", "THIS", "BE",
]


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct) without exploding (JVM array ops)."""
    toks = spark_tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


def _argmax_lang(langs, score_col) -> F.Column:
    """argmax over per-language score columns with ties won by the
    FIRST language in `langs`: fold from the right with >= so an
    earlier language displaces an equal-scoring later one. The single
    definition keeps the tie-break in lock-step across every operator
    that predicts a language (its SQL rendition lives in the
    entry oracles' CASE chain)."""
    pred = F.lit(langs[-1])
    best = score_col(langs[-1])
    for lang in reversed(langs[:-1]):
        c = score_col(lang)
        pred = F.when(c >= best, F.lit(lang)).otherwise(pred)
        best = F.when(c >= best, c).otherwise(best)
    return pred


def langid_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, <lang>_cnt..., pred_lang) via marker-stopword counts; tie-break
    follows LANG_ORDER. A deterministic n-gram-free heuristic — the honest
    baseline for a langid stage (real models plug in as pandas UDFs)."""
    toks = spark_tokens(F.col(text_col))
    cols = [F.col(id_col)]
    for lang in LANG_ORDER:
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        cnt = F.size(
            F.filter(toks, lambda t: F.array_contains(markers, t))
        )
        cols.append(cnt.alias(f"{lang}_cnt"))
    out = df.select(*cols)
    return out.withColumn(
        "pred_lang",
        _argmax_lang(LANG_ORDER, lambda lg: F.col(f"{lg}_cnt")),
    )


def quality_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, stopword_ratio, distinct_ratio)
    — the classic web-text quality features (length, lexical diversity,
    stopword density). Ratios rounded to 6 for cross-engine comparison."""
    toks = spark_tokens(F.col(text_col))
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, F.round(total_len / n_tokens, 6))
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
        F.when(n_tokens > 0, F.round(n_stop / n_tokens, 6))
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
        F.when(n_tokens > 0, F.round(F.size(F.array_distinct(toks)) / n_tokens, 6))
        .otherwise(F.lit(0.0))
        .alias("distinct_ratio"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, fp, min_shingle) — fp = md5 of normalized text (exact-dup key),
    min_shingle = lexicographic min md5 over word n-gram shingles (a 1-slot
    minhash; robust to small edits)."""
    # tokens projected first: shingles()'s transform lambda re-evaluates
    # any non-materialized expression it references PER ELEMENT — an
    # inlined tokenizer here is O(n_tokens^2) per doc (dedup.py round-5
    # fix; same disease as the r4 langid one)
    toks = F.col("_toks")
    sh = shingles(toks, n)
    min_sh = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.select(
        F.col(id_col), spark_tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.md5(F.array_join(toks, " ")).alias("fp"),
        min_sh.alias("min_shingle"),
    )


def _langid_model() -> dict:
    import json
    from importlib import resources

    # zip-safe (spark-submit --py-files ships the package as a zip)
    ref = resources.files("text_search_spark") / "data" / "langid_weights.json"
    return json.loads(ref.read_text())


def langid_hashed_weights(n_buckets: int):
    """Feature-hashed langid weight table (Weinberger et al. 2009
    "Feature Hashing for Large Scale Multitask Learning"): features
    hash into `n_buckets` fixed buckets via the engine's XXH64
    (driver-side xxhash64_str, bit-identical to Spark's F.xxhash64 —
    tests/test_xxhash.py), and colliding features' weights SUM per
    bucket. The table is then bounded at n_buckets rows no matter how
    large the trained vocabulary grows — the broadcast-size seam the
    exact path documents.

    Returns (rows, langs, n_features, n_collisions): rows =
    [(bucket, w_lang0, ...)], n_collisions = features sharing an
    already-occupied bucket (prediction parity vs the exact table is
    pinned per-fixture in tests/test_langid.py, not guaranteed in
    general — collisions perturb scores)."""
    from ..functions.xxhash import pmod, xxhash64_str

    model = _langid_model()
    langs = model["langs"]
    agg: dict = {}
    n_feats = 0
    for feat, ws in sorted(model["weights"].items()):
        n_feats += 1
        b = pmod(xxhash64_str(feat), n_buckets)
        cur = agg.setdefault(b, [0] * len(langs))
        for i, x in enumerate(ws):
            cur[i] += int(x)
    rows = [(b, *vals) for b, vals in sorted(agg.items())]
    return rows, langs, n_feats, n_feats - len(agg)


def langid_ngram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed_buckets: Optional[int] = None,
) -> DataFrame:
    """Char-n-gram linear language scorer (the fastText-style public
    recipe, Joulin et al. 2016, arXiv:1607.01759) over deterministic
    integer weights trained offline by scripts/train_langid.py and
    checked into the repo: features = every unigram + trigram of
    lower(text); score(lang) = sum of that language's integer weight
    over matched feature OCCURRENCES (multinomial naive Bayes);
    prediction = argmax with ties won by the first language in the
    model's order. Integer weights make the sums exact in any engine,
    so the DuckDB oracle replays the scorer verbatim.

    Shape at 100 TB: per-row JVM feature explode, one broadcast join
    against the ~300-row weight table, one map-side-combined sum keyed
    by doc — no skew (weights are replicated, docs are the partition
    key).

    hashed_buckets=None (default): exact feature-string weight table —
    the oracle-replayable path. hashed_buckets=B: feature-HASHED
    weight table (langid_hashed_weights) bounded at B rows regardless
    of vocabulary size — the open-vocabulary scale path; the join key
    becomes pmod(xxhash64(feat), B), still JVM-side, and predictions
    are pinned identical to the exact path on the training fixture
    (tests/test_langid.py) with the collision count reported there.

    Columns: (doc_id, s_<lang>..., pred_lang_ngram)."""
    model = _langid_model()
    langs = model["langs"]
    spark = df.sparkSession
    if hashed_buckets is not None:
        hrows, langs, _nf, _nc = langid_hashed_weights(hashed_buckets)
        wdf = spark.createDataFrame(
            hrows,
            "bucket int, " + ", ".join(f"w_{lg} long" for lg in langs),
        )
    else:
        wrows = [
            (feat, *[int(x) for x in ws])
            for feat, ws in sorted(model["weights"].items())
        ]
        wdf = spark.createDataFrame(
            wrows,
            "feat string, " + ", ".join(f"w_{lg} long" for lg in langs),
        )
    # ONE linear pass splits the text into codepoints ('(?s).' matches
    # any single code point incl. newlines and astral pairs — the same
    # unit substr counts, so feature strings are unchanged); trigrams
    # then come from O(1) element_at over that array. Per-index
    # t.substr(i, k) instead seeks the i-th codepoint from the string
    # start on every call — O(n^2) per document on non-ASCII text. The
    # array MUST be materialized as its own projected column before the
    # lambda references it: an expression used inside transform()'s
    # lambda is re-evaluated per element (no cross-lambda CSE), which
    # would re-run the regexp once per trigram — O(n^2) again, measured
    # as a multi-minute hang on 100k-char docs.
    # A doc-id pre-partition before the explode (the dedup.simhash
    # round-8b shape) was A/B'd here and REJECTED: it measured faster
    # locally (1.2-2.2 -> 1.0-1.4 s at 50k docs), but the win is the
    # merged input-normalization exchange plus one fewer stage, NOT
    # narrower shuffle bytes — langid's map-side partial row is only
    # 5 sum columns (~50 B/doc, the explode keeps each doc's features
    # in its partition so combining reduces fully), strictly narrower
    # than shuffling the text itself at any real document size. The
    # default partial-agg shape is the 100 TB shape; keep it.
    chars_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("(?s)."), 0
        ).alias("chars"),
    )
    ch = F.col("chars")
    n = F.size(ch)
    empty = F.array().cast("array<string>")
    tri = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat(
                F.element_at(ch, i),
                F.element_at(ch, i + 1),
                F.element_at(ch, i + 2),
            ),
        ),
    ).otherwise(empty)
    # explode_outer keeps a (doc, NULL) row for feature-less docs and the
    # weight join is LEFT, so every doc survives to the groupBy — no
    # second docs-side join (which would plan as a sort-merge shuffle of
    # the whole corpus). One broadcast join + ONE map-side-combined agg.
    feats = chars_df.select(
        "doc_id",
        F.explode_outer(F.concat(ch, tri)).alias("feat"),
    )
    if hashed_buckets is not None:
        # NULL feat (feature-less doc) must stay NULL — xxhash64(NULL)
        # would hash the seed and could land in an occupied bucket,
        # giving an empty doc a phantom score
        feats = feats.select(
            "doc_id",
            F.when(
                F.col("feat").isNotNull(),
                F.pmod(
                    F.xxhash64(F.col("feat")), F.lit(hashed_buckets)
                ).cast("int"),
            ).alias("bucket"),
        )
        join_key = "bucket"
    else:
        join_key = "feat"
    out = (
        feats.join(F.broadcast(wdf), join_key, "left")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.coalesce(F.col(f"w_{lg}"), F.lit(0)))
                .cast("long")
                .alias(f"s_{lg}")
                for lg in langs
            ]
        )
    )
    return out.withColumn(
        "pred_lang_ngram",
        _argmax_lang(langs, lambda lg: F.col(f"s_{lg}")),
    )


def profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The full per-document text-analysis profile in ONE scan: every
    column of token_counts + langid_scores + quality_stats +
    doc_fingerprint + bpe_token_counts, computed as per-row JVM
    expressions in a single select — zero shuffles, zero joins. This is
    the shape a 100 TB profiling pass should take: the five metric
    families share the tokenization work and ride one scan instead of
    five (or a 5-way self-join). The individual operators stay available
    for callers that want one family only.

    Columns: (doc_id, n_chars, n_tokens, n_distinct, avg_token_len,
    stopword_ratio, distinct_ratio, <lang>_cnt..., pred_lang, fp,
    min_shingle, n_bpe_tokens).

    The token array is materialized as its own projected column first
    (one scan, two stacked projections, still zero shuffles): the
    shingle builder's transform lambda re-evaluates non-materialized
    referenced expressions per element — an inlined tokenizer there is
    O(n_tokens^2) per doc — and materializing also guarantees the
    tokenizer runs ONCE per row for all metric families regardless of
    per-column subexpression-elimination behavior."""
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sh = shingles(toks, 3)
    cols = [
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.when(n_tokens > 0, F.round(total_len / n_tokens, 6))
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
        F.when(n_tokens > 0, F.round(n_stop / n_tokens, 6))
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
        F.when(
            n_tokens > 0,
            F.round(F.size(F.array_distinct(toks)) / n_tokens, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("distinct_ratio"),
    ]
    for lang in LANG_ORDER:
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        cols.append(
            F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
            .alias(f"{lang}_cnt")
        )
    cols.extend(
        [
            F.md5(F.array_join(toks, " ")).alias("fp"),
            F.array_min(F.transform(sh, lambda s: F.md5(s))).alias(
                "min_shingle"
            ),
            F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias(
                "n_bpe_tokens"
            ),
        ]
    )
    out = df.select(
        F.col(id_col),
        F.col(text_col),
        spark_tokens(F.col(text_col)).alias("_toks"),
    ).select(*cols)
    return out.withColumn(
        "pred_lang",
        _argmax_lang(LANG_ORDER, lambda lg: F.col(f"{lg}_cnt")),
    )


# BPE-ish segmentation regex: word pieces = runs of letters, runs of
# digits, or single non-space symbols — the classic pre-tokenizer shape
# (GPT-2-style coarse split without merges). Portable across Java regex /
# RE2 / Python re.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f]"


def bpe_token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bpe_tokens) — whitespace-free piece count via regexp_count of
    BPE_RE (JVM-side, no explode)."""
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias("n_bpe_tokens"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021, "Scaling Language Models", table A1 — public paper):

      dup_line_frac       fraction of non-empty lines that repeat an
                          earlier line
      dup_line_char_frac  fraction of line characters inside the extra
                          occurrences of repeated lines
      top_bigram_frac     fraction of tokens covered by the single most
                          frequent token bigram

    Line metrics are pure per-row JVM expressions (split + array_distinct
    + aggregate — no shuffle); the bigram metric explodes bigrams and
    reduces with ONE map-side-combined agg keyed by (doc, bigram) then a
    per-doc max — at 100 TB both shuffles carry one row per distinct key,
    never per token. Degenerate inputs (no newlines, <2 tokens) yield 0."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0
    )
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    chars = lambda arr: F.aggregate(
        arr, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    total_chars = chars(lines)
    distinct_chars = chars(F.array_distinct(lines))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        F.round(
            F.when(
                n_lines > 0,
                (n_lines - n_distinct).cast("double") / n_lines,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.when(
                total_chars > 0,
                (total_chars - distinct_chars).cast("double") / total_chars,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_char_frac"),
        spark_tokens(F.col(text_col)).alias("toks"),
    )
    toks = F.col("toks")
    n_tokens = F.size(toks)
    bigrams = F.when(
        n_tokens >= 2,
        F.transform(
            F.sequence(F.lit(0), n_tokens - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = base.select(
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        n_tokens.alias("n_tokens"),
        F.explode_outer(bigrams).alias("bigram"),
    )
    top = (
        exploded.groupBy(
            "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
            "n_tokens", "bigram",
        )
        .count()
        .groupBy(
            "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
            "n_tokens",
        )
        .agg(
            F.max(
                F.when(F.col("bigram").isNotNull(), F.col("count"))
                .otherwise(F.lit(0))
            ).alias("top_bigram_n")
        )
    )
    return top.select(
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                # a bigram occurring k times covers 2k token slots,
                # capped at n_tokens (overlapping occurrences)
                F.least(
                    2.0 * F.col("top_bigram_n") / F.col("n_tokens"),
                    F.lit(1.0),
                ),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
    )
