"""Text-analysis operators for training-data pipelines: token
counting, quality scoring, language ID, fingerprinting.

All hot-path arithmetic is built-in `pyspark.sql.functions`
(JVM-side, codegen'd); nothing here uses a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentsdb_aura_spark.operators.dedup_text import tokens

# Tiny deterministic stopword list for quality ratios (order matters
# nowhere; membership only).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Marker-word lists for the n-gram/stopword language-ID heuristic.
# Deterministic and intentionally tiny — a real deployment would load
# a proper model; the *operator shape* (score per language, argmax
# with stable tie-break) is what the engine provides.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "los", "es", "de"),
    "fr": ("le", "la", "les", "est", "et"),
    "zh": ("de", "shi", "le", "zai", "he"),
}


def token_stats(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token + byte counts per doc: (doc_id, n_tokens, n_bytes).

    Empty / whitespace-only text counts 0 tokens — split engines
    return [''] for the empty string, which would report a phantom
    token and make ``n_tokens >= 1`` curation filters keep empty docs.
    """
    toks = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes"),
    )


def bpe_ish_token_count(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token estimate: count of word-piece-like regex matches
    — runs of letters, runs of digits, or single non-space symbols
    (the standard cheap proxy when no tokenizer is shippable to
    executors).  RE2-compatible pattern (no lookaround) so the same
    expression runs on any engine."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return docs.select(F.col(id_col).alias("doc_id"), F.size(pieces).cast("bigint").alias("n_bpe_tokens"))


def quality_scores(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: (doc_id, n_tokens, stopword_ratio,
    mean_token_len, punct_ratio)."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)  # 0 for empty docs (tokens() filters empties)
    sw = F.lit(list(STOPWORDS))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_punct = F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.when(n_tok == 0, F.lit(0.0)).otherwise(n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        F.when(n_tok == 0, F.lit(0.0)).otherwise(total_len.cast("double") / n_tok).alias("mean_token_len"),
        # empty text has length 0: ratio defined as 0, not a crash
        F.when(F.length(F.col(text_col)) == 0, F.lit(0.0))
        .otherwise(n_punct.cast("double") / F.length(F.col(text_col)))
        .alias("punct_ratio"),
    )


def lang_id(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    models: dict | None = None,
    n_features: int = 128,
    ngram: int = 3,
) -> DataFrame:
    """Language ID → (doc_id, pred_lang, score).

    Default is the zero-training marker-word heuristic (per-language
    hit counts, argmax with alphabetical tie-break).  Passing
    ``models`` — a dict of lang → (weights, bias) from
    :func:`~opentsdb_aura_spark.operators.quality.train_logreg_weights`
    over :func:`~opentsdb_aura_spark.operators.quality.
    hashed_char_ngram_features` — swaps in the TRAINED one-vs-rest
    classifier (the CCNet/fastText model class; Wenzek et al. 2020
    §4.2): char-n-gram presence features scored by all K models in
    one packed pass, ``score`` = the winning margin.  The heuristic
    stays as the fallback seam for corpora with no fitted model."""
    if models is not None:
        from opentsdb_aura_spark.operators.quality import (
            hashed_char_ngram_features,
            ovr_logreg_scores,
        )

        feats = hashed_char_ngram_features(
            docs, n=ngram, n_features=n_features, text_col=text_col, id_col=id_col
        )
        scored = ovr_logreg_scores(
            feats,
            models,
            docs.select(F.col(id_col).alias("doc_id")),
            n_features=n_features,
        )
        mcols = [F.col(f"margin_{c}") for c in sorted(models)]
        best = F.greatest(*mcols) if len(mcols) > 1 else mcols[0]
        return scored.select("doc_id", "pred_lang", best.alias("score"))
    toks = tokens(F.col(text_col))
    langs = sorted(LANG_MARKERS)
    scores = {}
    for lang in langs:
        markers = F.lit(list(LANG_MARKERS[lang]))
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    best = F.greatest(*[scores[lang] for lang in langs])
    # first alphabetical language reaching the max wins ties — a
    # when-chain in language order, trivially replicable in plain SQL
    pred = F.when(scores[langs[0]] == best, F.lit(langs[0]))
    for lang in langs[1:]:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        best.cast("bigint").alias("score"),
    )


# PII masking rules, applied in order.  Patterns avoid lookaround and
# backreferences so the same expression runs under Java regex (Spark)
# and RE2 (DuckDB/Go) alike.  Order matters: emails first (their
# domains contain dots that would otherwise feed the IP pattern),
# then IPs, then the dashed-number shapes.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Mask PII-shaped spans (emails, IPv4s, SSN-shaped and phone-shaped
    numbers) in one JVM-side pass: (doc_id, scrubbed, n_email, n_ip,
    n_ssn, n_phone).

    Each rule's count is taken over the text as already scrubbed by the
    preceding rules, so a span consumed by an earlier mask is never
    double-counted (an SSN inside an email's digits, say).  Everything
    is `regexp_count`/`regexp_replace` — codegen'd, no Python, no
    shuffle; at 100 TB this is a pure map stage."""
    t = F.col(text_col)
    counts = []
    for name, pat, rep in PII_RULES:
        counts.append(F.regexp_count(t, F.lit(pat)).cast("bigint").alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, rep)
    return docs.select(F.col(id_col).alias("doc_id"), t.alias("scrubbed"), *counts)


def fingerprint(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", token_hash: str = "xxhash64"
) -> DataFrame:
    """Order-sensitive document fingerprint: a hash chained over
    token-position pairs (a rolling-hash analogue that stays in
    Catalyst).  (doc_id, fingerprint).

    ``token_hash``: "xxhash64" (default — 64-bit BIGINT fingerprint,
    JVM-native) or "md5" — the chain folds md5 over "acc:token:pos"
    strings and the fingerprint is the final 32-hex-char string.  md5
    exists in every SQL engine and the fold is expressible as a
    ``list_reduce``, so the md5 variant's fingerprints are exactly
    recomputable by a DuckDB oracle (the same cross-engine trick as
    ``dedup_text.simhash(token_hash="md5")``); token order, token
    positions, and the empty-token filter all still matter to the
    value."""
    toks = tokens(F.col(text_col))
    if token_hash == "md5":
        posed = F.transform(toks, lambda t, i: F.concat(t, F.lit(":"), i.cast("string")))
        fp = F.aggregate(
            posed, F.lit(""), lambda acc, p: F.md5(F.concat(acc, F.lit(":"), p))
        )
    elif token_hash == "xxhash64":
        posed = F.transform(toks, lambda t, i: F.xxhash64(t, i))
        fp = F.aggregate(posed, F.lit(0).cast("long"), lambda acc, h: F.xxhash64(acc, h))
    else:
        raise ValueError(f"token_hash must be 'xxhash64' or 'md5', got {token_hash!r}")
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


def bm25_search(
    docs: DataFrame,
    query_tokens: "list[str]",
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ranked full-text retrieval: BM25 score of each doc against a
    bag of query tokens, top-k by score (ties → doc id asc).
    Complements the boolean ``events.text_match`` (E1) with the ranked
    search a corpus user actually runs.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) — the Robertson/Sparck-Jones
    formulation, entirely as aggregates:

    * per-(doc, query-token) tf — the explode is FILTERED to query
      tokens before the aggregate, so the shuffle carries only
      query-term hits, not the corpus token stream;
    * df per query token and the (N, avgdl) scalars ride in via 1-row
      cross joins (Catalyst broadcasts them — no driver collect);
    * final top-k is an order-by-limit over scored docs
      (TakeOrderedAndProject, no global sort materialization).
    """
    from collections import Counter

    # bag semantics: a token repeated in the query weights its term's
    # contribution by its query-side multiplicity (standard BM25 qtf)
    qtf = Counter(t.lower() for t in query_tokens)
    q = sorted(qtf)
    toked = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    lengths = toked.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    stats = lengths.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = toked.where(F.col("token").isin(q))
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").cast("double").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    qtf_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in qtf.items() for x in kv]), F.col("token")
    ).cast("double")
    term = qtf_col * F.col("_idf") * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(stats)
        .withColumn("_idf", idf)
        .join(lengths, "doc_id")
        .withColumn("_term", term)
        .groupBy("doc_id")
        .agg(F.sum("_term").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(int(k))


# ------------------------------------------------------------- BPE training


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right BPE merge of adjacent (a, b) into a+b over
    a symbol array — a pure-Catalyst fold (aggregate HOF), no Python.
    ``try_element_at`` keeps the empty-accumulator peek NULL-safe under
    ANSI mode; left-to-right greediness falls out of the fold order
    ('aaa' under merge (a,a) → ['aa','a'], the Sennrich behavior)."""
    ab = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (s == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


# Distinct-word cap under which the tokenizer training loops collect
# the word-frequency table once and fold the merges driver-side — the
# resolve_duplicate_clusters discipline (<=200k edges driver union-find,
# distributed above).  |vocab| grows sublinearly with corpus size, so
# at fixture scale the table is tiny and the distributed loop's cost is
# pure orchestration (8 rounds x several jobs over <=1k rows, measured
# ~0.3-0.6 s/round of driver+stage overhead); above the cap the
# distributed loop is unchanged.  The local fold replicates the engine
# arithmetic exactly: integer pair counts, IEEE-double scores
# (double(pair)/(double(ca)*double(cb)) — one rounding each, same as
# the Catalyst cast chain), argmax tie-broken on UTF-8 BYTE order (the
# UTF8String sort order Spark's orderBy uses; Python code-point order
# differs above U+FFFF, hence the encode).
_TRAIN_LOCAL_CAP = 200_000


def _local_syms_probe(vocab: DataFrame, cap: int) -> list | None:
    """Collect the (syms, cnt) word table iff it has <= cap rows —
    the limit(cap+1) probe pattern.  The syms arrays are built by the
    ENGINE (split/filter/concat), so character segmentation semantics
    never re-derive in Python.  Returns None when over the cap."""
    rows = vocab.limit(int(cap) + 1).collect()
    if len(rows) > int(cap):
        return None
    return [(list(r[0]), int(r[1])) for r in rows]


def _local_merge_fold(syms: list, a: str, b: str) -> list:
    """Driver-side replica of :func:`_merge_pair_expr`'s greedy
    left-to-right fold ('aaa' under (a,a) -> ['aa','a'])."""
    out: list = []
    ab = a + b
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = ab
        else:
            out.append(s)
    return out


def _u8(s: str) -> bytes:
    return s.encode("utf-8")


def bpe_train(
    docs: DataFrame,
    *,
    n_merges: int = 8,
    text_col: str = "text",
    eow: str = "</w>",
) -> DataFrame:
    """Learn BPE merges from a corpus (Sennrich et al., "Neural Machine
    Translation of Rare Words with Subword Units" — the subword-vocab
    training stage every LLM-data pipeline runs before tokenizing):
    iteratively merge the most frequent adjacent symbol pair, starting
    from characters + an end-of-word marker.

    Distributed shape: training runs on the WORD-FREQUENCY table, not
    the corpus (the classic optimization — |vocab| ≪ |corpus|, and the
    corpus pass is ONE explode + hash agg).  Each round is a narrow
    pair-explode + one hash agg + a 1-row argmax collect, then a
    pure-Catalyst fold applies the merge to every word; the vocab is
    localCheckpointed per round so the loop's lineage stays flat
    (same discipline as resolve_duplicate_clusters).  The driver holds
    one row per round — n_merges is small and bounded by definition.

    Deterministic: tie-break is (pair_count DESC, left, right) with
    binary string order, identical in Spark and DuckDB — the catalog
    query's unrolled SQL oracle re-derives every round exactly.
    Stops early when no adjacent pair remains (fewer than n_merges
    rows out).

    Returns (rank, lhs, rhs, merged, pair_count) — one row per learned
    merge, rank 0 first.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    chars = F.filter(F.split(F.col("w"), ""), lambda t: t != "")
    # lazy checkpoints throughout the loop: each round's argmax
    # collect materializes that round's vocab as a side effect (one
    # fold step past the previous checkpoint), instead of paying a
    # separate materialization job per merge — halves the loop's job
    # count while lineage stays exactly one round deep
    vocab = words.select(F.concat(chars, F.array(F.lit(eow))).alias("syms"), "cnt")

    merges: list[tuple] = []
    local = _local_syms_probe(vocab, _TRAIN_LOCAL_CAP)
    if local is not None:
        # the whole loop is per-word arithmetic over the collected
        # table — ONE job total instead of 8 rounds x (explode + agg +
        # takeOrdered); argmax = (pair_count DESC, lhs, rhs) in UTF-8
        # byte order, the exact engine sort key
        for rank in range(int(n_merges)):
            pc: dict = {}
            for syms, cnt in local:
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    pc[k] = pc.get(k, 0) + cnt
            if not pc:
                break
            (a, b), cnt = min(
                pc.items(), key=lambda kv: (-kv[1], _u8(kv[0][0]), _u8(kv[0][1]))
            )
            merges.append((rank, a, b, a + b, int(cnt)))
            local = [(_local_merge_fold(s, a, b), c) for s, c in local]
        return spark.createDataFrame(
            merges, "rank int, lhs string, rhs string, merged string, pair_count long"
        )

    # lazy checkpoints throughout the distributed loop: each round's
    # argmax collect materializes that round's vocab as a side effect
    vocab = vocab.localCheckpoint(eager=False)
    for rank in range(int(n_merges)):
        left = F.slice(F.col("syms"), F.lit(1), F.size(F.col("syms")) - 1)
        right = F.slice(F.col("syms"), F.lit(2), F.size(F.col("syms")) - 1)
        pairs = vocab.select(
            F.explode(
                F.zip_with(left, right, lambda a, b: F.struct(a.alias("a"), b.alias("b")))
            ).alias("p"),
            "cnt",
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["pair_count"])
        merges.append((rank, a, b, a + b, cnt))
        vocab = vocab.select(
            _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "cnt"
        ).localCheckpoint(eager=False)

    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, merged string, pair_count long"
    )


def wordpiece_train(
    docs: DataFrame,
    *,
    n_merges: int = 8,
    text_col: str = "text",
    eow: str = "</w>",
) -> DataFrame:
    """Learn WordPiece merges (Schuster & Nakajima 2012; the BERT
    tokenizer's training rule) — the THIRD trained-subword family next
    to BPE and the unigram LM: identical merge mechanics to
    :func:`bpe_train`, but each round merges the pair maximizing the
    LIKELIHOOD score count(ab) / (count(a)·count(b)) instead of the
    raw pair count — rare symbols that almost always co-occur merge
    before frequent-but-independent ones.

    Same distributed shape as bpe_train (train on the word-frequency
    table; each round one pair hash-agg + one symbol hash-agg + a
    1-row argmax collect + a pure-Catalyst fold), with one extra
    narrow aggregate per round for the unigram symbol counts.  The
    score is an IEEE double computed from exact integer counts in a
    pinned expression shape (double(pair)/(double(ca)·double(cb))),
    so the argmax — tie-broken (score DESC, left, right) — is
    engine-exact and the catalog oracle re-derives every round.

    Returns (rank, lhs, rhs, merged, pair_count, score) — one row per
    learned merge, rank 0 first."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    chars = F.filter(F.split(F.col("w"), ""), lambda t: t != "")
    # lazy loop checkpoints — same one-job-per-round discipline as
    # bpe_train (the round's single argmax collect materializes the
    # round's vocab; lineage stays one fold step deep)
    vocab = words.select(F.concat(chars, F.array(F.lit(eow))).alias("syms"), "cnt")

    merges: list[tuple] = []
    local = _local_syms_probe(vocab, _TRAIN_LOCAL_CAP)
    if local is not None:
        # one job total (the probe); the likelihood score is computed
        # on the SAME doubles the engine casts (exact ints < 2^53 →
        # double conversions are exact, one rounding in the multiply
        # and one in the divide — identical association), argmax
        # tie-broken (score DESC, lhs, rhs) in UTF-8 byte order
        for rank in range(int(n_merges)):
            pc: dict = {}
            uc: dict = {}
            for syms, cnt in local:
                for i, s in enumerate(syms):
                    uc[s] = uc.get(s, 0) + cnt
                    if i + 1 < len(syms):
                        k = (s, syms[i + 1])
                        pc[k] = pc.get(k, 0) + cnt
            if not pc:
                break
            scored = {
                k: float(v) / (float(uc[k[0]]) * float(uc[k[1]]))
                for k, v in pc.items()
            }
            (a, b), score = min(
                scored.items(), key=lambda kv: (-kv[1], _u8(kv[0][0]), _u8(kv[0][1]))
            )
            merges.append((rank, a, b, a + b, int(pc[(a, b)]), score))
            local = [(_local_merge_fold(s, a, b), c) for s, c in local]
        return spark.createDataFrame(
            merges,
            "rank int, lhs string, rhs string, merged string, pair_count long, score double",
        )

    # lazy loop checkpoints — same one-job-per-round discipline as
    # bpe_train's distributed path
    vocab = vocab.localCheckpoint(eager=False)
    for rank in range(int(n_merges)):
        left = F.slice(F.col("syms"), F.lit(1), F.size(F.col("syms")) - 1)
        right = F.slice(F.col("syms"), F.lit(2), F.size(F.col("syms")) - 1)
        pairs = vocab.select(
            F.explode(
                F.zip_with(left, right, lambda a, b: F.struct(a.alias("a"), b.alias("b")))
            ).alias("p"),
            "cnt",
        )
        pc = pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
            F.sum("cnt").alias("pair_count")
        )
        uni = (
            vocab.select(F.explode("syms").alias("s"), "cnt")
            .groupBy("s")
            .agg(F.sum("cnt").alias("ucnt"))
        )
        ua = uni.select(F.col("s").alias("a"), F.col("ucnt").alias("ca"))
        ub = uni.select(F.col("s").alias("b"), F.col("ucnt").alias("cb"))
        score = F.col("pair_count").cast("double") / (
            F.col("ca").cast("double") * F.col("cb").cast("double")
        )
        best = (
            pc.join(ua, "a")
            .join(ub, "b")
            .select("a", "b", "pair_count", score.alias("score"))
            .orderBy(F.col("score").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append(
            (rank, a, b, a + b, int(best[0]["pair_count"]), float(best[0]["score"]))
        )
        vocab = vocab.select(
            _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "cnt"
        ).localCheckpoint(eager=False)

    return spark.createDataFrame(
        merges,
        "rank int, lhs string, rhs string, merged string, pair_count long, score double",
    )


def wordpiece_greedy_apply(
    docs: DataFrame,
    vocab,
    *,
    max_symbols: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    eow: str = "</w>",
) -> DataFrame:
    """PRODUCTION WordPiece tokenization: greedy longest-match-first
    segmentation against a trained vocabulary (the rule BERT's
    tokenizer actually runs — NOT the training-fold replay
    :func:`bpe_apply` uses), with the spec's all-or-nothing unknown
    rule: a word containing any unmatchable symbol tokenizes to ONE
    [UNK] piece.

    ``vocab`` is the trained piece list (base characters + merged
    symbols + the end-of-word marker, e.g. from
    :func:`wordpiece_train`'s merge table).  Matching runs on the
    SYMBOL array (chars + one trailing ``eow`` element), a candidate
    piece being the concatenation of up to ``max_symbols`` adjacent
    symbols — so the multi-char eow marker can never be confused with
    literal ``<``/``/`` characters in corpus text.

    Scale shape: segmentation is a pure-Catalyst fold over the
    DISTINCT-WORD table (each word segmented once; the fold consumes
    ≥1 symbol per step so len(syms) steps suffice, each trying the
    ≤ max_symbols candidate lengths longest-first against the vocab
    as a literal map); per-doc counts are one explode + join + sum.
    Returns (doc_id, n_subwords, n_unk_words).

    ``max_symbols`` must be ≥ the widest piece's base-symbol span or
    long pieces silently never match; the default derives a safe
    upper bound from the vocabulary itself (a piece spans at most
    len(piece) base symbols, since every base symbol is ≥1 char)."""
    pieces = sorted(set(vocab))
    if not pieces:
        raise ValueError("wordpiece_greedy_apply: empty vocabulary")
    if max_symbols is None:
        max_symbols = max(len(p) for p in pieces)
    vmap = F.map_from_arrays(F.lit(list(pieces)), F.lit([1] * len(pieces)))
    words = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("n"))
    distinct_w = words.select("w").distinct()
    syms = F.concat(
        F.filter(F.split(F.col("w"), ""), lambda t: t != ""), F.array(F.lit(eow))
    )
    size = F.size(syms)

    def step(acc, _):
        pos, n, unk = acc["pos"], acc["n"], acc["unk"]
        # innermost fallback: unmatchable symbol → flag unk, advance 1
        branch = F.struct(
            (pos + 1).alias("pos"), (n + 1).alias("n"), F.lit(True).alias("unk")
        )
        # wrap k=1..max ascending so the OUTERMOST when (checked first)
        # is the LONGEST candidate — greedy longest-match-first
        for k in range(1, int(max_symbols) + 1):
            piece = F.array_join(F.slice(syms, pos, k), "")
            cond = (pos + k - 1 <= size) & vmap.getItem(piece).isNotNull()
            branch = F.when(
                cond,
                F.struct((pos + k).alias("pos"), (n + 1).alias("n"), unk.alias("unk")),
            ).otherwise(branch)
        return F.when(pos > size, acc).otherwise(branch)

    init = F.struct(
        F.lit(1).alias("pos"), F.lit(0).alias("n"), F.lit(False).alias("unk")
    )
    fin = F.aggregate(F.sequence(F.lit(1), size), init, step)
    seg = distinct_w.select(
        "w",
        F.when(fin["unk"], F.lit(1)).otherwise(fin["n"]).alias("n_syms"),
        fin["unk"].alias("is_unk"),
    )
    per_doc = (
        wc.join(seg, "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.col("n_syms")).cast("long").alias("n_subwords"),
            F.sum(F.when(F.col("is_unk"), F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_unk_words"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_subwords", F.lit(0).cast("long")).alias("n_subwords"),
            F.coalesce("n_unk_words", F.lit(0).cast("long")).alias("n_unk_words"),
        )
    )


def bpe_apply(
    docs: DataFrame,
    merges,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    eow: str = "</w>",
) -> DataFrame:
    """Apply a learned merge list (rank-ordered (lhs, rhs) pairs from
    :func:`bpe_train`) — the tokenize-with-trained-vocab stage.

    Scale shape: merges apply to the DISTINCT-WORD table (each word
    segmented once, however often it recurs), as a chain of
    pure-Catalyst folds (one per merge, rank order — BPE application
    is sequential by definition); per-doc subword counts then come
    from one explode + join + sum, never a per-doc Python pass.

    Returns (doc_id, n_subwords) — the trained-vocab token count per
    document."""
    spark = docs.sparkSession
    words = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("n"))
    vocab = words.select("w").distinct()
    syms = F.concat(F.filter(F.split(F.col("w"), ""), lambda t: t != ""), F.array(F.lit(eow)))
    for a, b in merges:
        syms = _merge_pair_expr(syms, a, b)
    seg = vocab.select("w", F.size(syms).alias("n_syms"))
    per_doc = (
        wc.join(seg, "w")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("n_syms")).cast("long").alias("n_subwords"))
    )
    # empty/whitespace-only docs have no words: count 0, not a dropped row
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select("doc_id", F.coalesce("n_subwords", F.lit(0).cast("long")).alias("n_subwords"))
    )


# ---------------------------------------------- unigram-LM tokenizer

#: piece separator inside a segmentation string — same unit separator
#: the shingle hashes use; cannot occur in whitespace-split tokens
_USEG_SEP = "\x1f"

#: log-probabilities are quantized to integer micro-nats before the
#: Viterbi DP, so path scores are exact BIGINT sums — segmentation
#: argmax and its tie-breaks become engine-exact (no float-order drift
#: between Spark, the Python driver loop, and a SQL oracle)
_USEG_SCALE = 1_000_000


def _ilogp(p: float) -> int:
    """round(ln(p)·1e6 + 1e-9) with HALF-AWAY-FROM-ZERO rounding —
    bit-identical to the oracle AS EXECUTED: the source CTE says
    ``CAST(round(ln(p)*1000000) AS BIGINT)``, and register()
    (queries/base.py) rewrites every ``round(`` to ``round(1e-9 + ``
    at registration, so DuckDB runs the same +1e-9 nudge this
    function applies (C libm ln on both sides; Python's builtin
    round is banker's and would disagree on exact halves)."""
    import math

    x = math.log(p) * _USEG_SCALE + 1e-9
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _useg_better(c, b):
    """Viterbi candidate order: higher score, then FEWER pieces, then
    lexicographically smallest segmentation string — a total order
    with no float comparisons (scores are integer micro-nats)."""
    return (
        (c["score"] > b["score"])
        | ((c["score"] == b["score"]) & (c["n"] < b["n"]))
        | (
            (c["score"] == b["score"])
            & (c["n"] == b["n"])
            & (c["seg"] < b["seg"])
        )
    )


def _local_viterbi_pieces(
    word: str, vocab: dict, max_piece_len: int, unk_lp: int
) -> list:
    """Driver-side replica of :func:`_viterbi_expr`'s DP for the
    bounded-fit path: integer micro-nat scores, candidate order
    (higher score, fewer pieces, byte-smallest segmentation), the
    same <unk> fallback for unseen single characters.  Returns the
    winning segmentation's pieces."""
    if not word:
        return []
    # dp[i] = (score, n, seg) for the best segmentation of word[:i]
    dp = [(0, 0, "")]
    for i in range(1, len(word) + 1):
        best = (-(2**62), 2**31 - 1, "")
        for length in range(1, min(int(max_piece_len), i) + 1):
            piece = word[i - length : i]
            lp = vocab.get(piece)
            if lp is None:
                if length != 1:
                    continue
                lp = unk_lp
            prev = dp[i - length]
            cand = (prev[0] + lp, prev[1] + 1, prev[2] + _USEG_SEP + piece)
            if (
                cand[0] > best[0]
                or (cand[0] == best[0] and cand[1] < best[1])
                or (
                    cand[0] == best[0]
                    and cand[1] == best[1]
                    and _u8(cand[2]) < _u8(best[2])
                )
            ):
                best = cand
        dp.append(best)
    return [p for p in dp[-1][2].split(_USEG_SEP) if p != ""]


def _viterbi_expr(word, vocab: dict, max_piece_len: int):
    """Best unigram segmentation of one word column under a bounded
    vocab → struct(score BIGINT, n pieces, seg '\\x1f'-joined) — the
    SentencePiece Viterbi encoder as ONE Catalyst expression: a fold
    over character positions whose accumulator is the DP table (array
    of best-prefix structs), each step maximizing over the ≤
    ``max_piece_len`` pieces that could end there.  The vocab rides as
    a literal map (bounded by construction — chars + top-K pieces), so
    segmentation is a narrow per-row pass: no join, no shuffle, no
    Python."""
    if not vocab:
        raise ValueError("_viterbi_expr: empty vocabulary")
    m = F.create_map(
        *[F.lit(x) for piece, lp in sorted(vocab.items()) for x in (piece, lp)]
    )
    # total coverage: a character the vocab has never seen (applying a
    # trained vocab to NEW text) scores as an <unk> piece strictly
    # below every real piece, instead of poisoning the DP with the
    # sentinel — SentencePiece's unk handling
    unk_lp = min(vocab.values()) - 1_000_000
    init = F.array(
        F.struct(
            F.lit(0).cast("long").alias("score"),
            F.lit(0).cast("int").alias("n"),
            F.lit("").alias("seg"),
        )
    )
    worst = F.struct(
        F.lit(-(2**62)).cast("long").alias("score"),
        F.lit(2**31 - 1).cast("int").alias("n"),
        F.lit("").alias("seg"),
    )

    def step(acc, i):
        def cand(length):
            start = (i - length + F.lit(1)).cast("int")
            piece = word.substr(start, length.cast("int"))
            prev = F.element_at(acc, start)  # best prefix ending at i-length
            lp = F.element_at(m, piece)
            lp = F.when(length == 1, F.coalesce(lp, F.lit(unk_lp))).otherwise(lp)
            return F.struct(
                (prev["score"] + lp).alias("score"),
                (prev["n"] + F.lit(1)).cast("int").alias("n"),
                F.concat(prev["seg"], F.lit(_USEG_SEP), piece).alias("seg"),
            )

        cands = F.filter(
            F.transform(F.sequence(F.lit(1), F.least(F.lit(max_piece_len), i)), cand),
            lambda s: s["score"].isNotNull(),  # piece not in vocab → NULL score
        )
        best = F.aggregate(
            cands, worst, lambda b, c: F.when(_useg_better(c, b), c).otherwise(b)
        )
        return F.concat(acc, F.array(best))

    dp = F.aggregate(F.sequence(F.lit(1), F.length(word)), init, step)
    # empty-string guard: F.sequence(1, 0) yields the DESCENDING [1, 0]
    # in Spark, and the i=0 step would hit element_at(acc, 0) — a
    # runtime error (SQL arrays are 1-indexed).  tokens() never emits
    # empty words, but an unfiltered caller must get the empty
    # segmentation, not a crashed query.
    empty = F.struct(
        F.lit(0).cast("long").alias("score"),
        F.lit(0).cast("int").alias("n"),
        F.lit("").alias("seg"),
    )
    return F.when(F.length(word) == 0, empty).otherwise(F.element_at(dp, -1))


def unigram_train(
    docs: DataFrame,
    *,
    seed_max_len: int = 4,
    keep_multi: int = 8,
    n_rounds: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Train a unigram-LM subword vocabulary (Kudo 2018, the
    SentencePiece model; hard-EM/Viterbi variant): seed with all
    substrings up to ``seed_max_len``, then alternate (E) Viterbi
    re-segmentation of the word table under the current piece
    log-probs with (M) count re-estimation and pruning to the top
    ``keep_multi`` multi-character pieces — single characters are
    never pruned, so every word stays coverable.  Laplace-smoothed
    probabilities keep zero-count survivors scorable.

    Distributed shape — the bpe_train loop discipline: everything
    runs on the DISTINCT-WORD frequency table (|vocab| ≪ |corpus|;
    the corpus pays one explode + hash agg); seeding is one substring
    explode + hash agg with a distributed top-K (never a full
    collect); each round is ONE narrow Viterbi pass over the word
    table (vocab as a literal map) + a tiny piece-count aggregation
    collected to the driver (bounded: ≤ alphabet + keep_multi rows).
    All loop state is integer counts and integer micro-nat log-probs,
    so the fit is exactly reproducible in unrolled SQL.

    Returns (piece, cnt, prob): final Viterbi counts and the relative
    frequency over the final vocabulary, one row per kept piece."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    spark = docs.sparkSession
    # bounded-fit probe (the bpe_train/_TRAIN_LOCAL_CAP discipline):
    # under the cap the seed top-K, both hard-EM rounds, and the
    # Viterbi DP run driver-side off ONE collect of the word table —
    # the DP is integer micro-nat arithmetic with byte-order ties, so
    # local ≡ distributed exactly (pinned by test); above the cap the
    # distributed loop below is unchanged
    local_rows = words.limit(_TRAIN_LOCAL_CAP + 1).collect()
    if len(local_rows) <= _TRAIN_LOCAL_CAP:
        wl = [(r["w"], int(r["cnt"])) for r in local_rows]
        seed_counts: dict = {}
        for wrd, cnt in wl:
            for i in range(len(wrd)):
                for length in range(1, int(seed_max_len) + 1):
                    if i + length <= len(wrd):
                        p = wrd[i : i + length]
                        seed_counts[p] = seed_counts.get(p, 0) + cnt
        chars_l = {p: c for p, c in seed_counts.items() if len(p) == 1}
        multi_l = sorted(
            ((p, c) for p, c in seed_counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], _u8(pc[0])),
        )[: int(keep_multi)]
        vocab_counts = dict(chars_l)
        vocab_counts.update(dict(multi_l))
        if not vocab_counts:
            raise ValueError("unigram_train: corpus has no tokens to train on")
        char_set = {p for p in vocab_counts if len(p) == 1}

        def probs_l(counts: dict) -> dict:
            total = sum(counts.values())
            v = len(counts)
            return {p: _ilogp((c + 1.0) / (total + v)) for p, c in counts.items()}

        for _ in range(int(n_rounds)):
            vocab = probs_l(vocab_counts)
            unk_lp = min(vocab.values()) - 1_000_000
            new_counts: dict = {}
            for wrd, cnt in wl:
                for piece in _local_viterbi_pieces(
                    wrd, vocab, int(seed_max_len), unk_lp
                ):
                    new_counts[piece] = new_counts.get(piece, 0) + cnt
            kept_multi = sorted(
                ((p, c) for p, c in new_counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[: int(keep_multi)]
            vocab_counts = {p: new_counts.get(p, 0) for p in char_set}
            vocab_counts.update(dict(kept_multi))

        out = spark.createDataFrame(
            sorted(vocab_counts.items()), "piece string, cnt long"
        )
        total = sum(vocab_counts.values())
        return out.select(
            "piece",
            "cnt",
            F.round(F.col("cnt") / F.lit(float(total)) + F.lit(1e-9), 6).alias("prob"),
        )

    words = words.localCheckpoint(eager=False)
    w = F.col("w")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(int(seed_max_len))),
                    lambda length: F.when(
                        i + length - 1 <= F.length(w), w.substr(i.cast("int"), length.cast("int"))
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    seed = (
        words.select(F.explode(subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    chars = seed.where(F.length("piece") == 1)
    multi = (
        seed.where(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(int(keep_multi))
    )
    # bounded collect: alphabet + keep_multi rows (the codebook rule)
    vocab_counts = {
        r["piece"]: int(r["cnt"]) for r in chars.unionByName(multi).collect()
    }
    if not vocab_counts:
        raise ValueError("unigram_train: corpus has no tokens to train on")
    char_set = {p for p in vocab_counts if len(p) == 1}

    def probs(counts: dict) -> dict:
        total = sum(counts.values())
        v = len(counts)
        return {p: _ilogp((c + 1.0) / (total + v)) for p, c in counts.items()}

    for _ in range(int(n_rounds)):
        vit = _viterbi_expr(w, probs(vocab_counts), int(seed_max_len))
        counts_rows = (
            words.select("cnt", F.explode(F.split(vit["seg"], _USEG_SEP)).alias("piece"))
            .where(F.col("piece") != "")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .collect()  # bounded: <= current vocab size rows
        )
        new_counts = {r["piece"]: int(r["cnt"]) for r in counts_rows}
        kept_multi = sorted(
            ((p, c) for p, c in new_counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[: int(keep_multi)]
        vocab_counts = {p: new_counts.get(p, 0) for p in char_set}
        vocab_counts.update(dict(kept_multi))

    spark = docs.sparkSession
    out = spark.createDataFrame(
        sorted(vocab_counts.items()), "piece string, cnt long"
    )
    total = sum(vocab_counts.values())
    return out.select(
        "piece",
        "cnt",
        F.round(F.col("cnt") / F.lit(float(total)) + F.lit(1e-9), 6).alias("prob"),
    )


def unigram_apply(
    docs: DataFrame,
    vocab: dict,
    *,
    max_piece_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a trained unigram vocab (piece → integer
    micro-nat log-prob): per-doc Viterbi piece counts → (doc_id,
    n_pieces).  Same shape as bpe_apply: each DISTINCT word segments
    once (narrow pass, vocab as a literal map), per-doc counts come
    from one explode + join + sum."""
    words = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("n"))
    distinct_w = words.select("w").distinct()
    seg = distinct_w.select(
        "w", _viterbi_expr(F.col("w"), vocab, int(max_piece_len))["n"].alias("n_pieces_w")
    )
    per_doc = (
        wc.join(seg, "w")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("n_pieces_w")).cast("long").alias("n_pieces"))
    )
    # token-less docs surface as 0, not as missing rows — the same
    # contract lm_bigram_scores keeps (a join/budget over the counts
    # must never silently lose documents)
    all_ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return all_ids.join(per_doc, "doc_id", "left").select(
        "doc_id", F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces")
    )


def unigram_train_vocab(
    docs: DataFrame,
    *,
    seed_max_len: int = 4,
    keep_multi: int = 8,
    n_rounds: int = 2,
    text_col: str = "text",
) -> dict:
    """The trained vocab as the piece → integer-micro-nat log-prob
    dict :func:`unigram_apply` consumes: re-runs the same Laplace
    smoothing over :func:`unigram_train`'s final counts (bounded
    collect — the vocab is driver-sized by construction)."""
    rows = unigram_train(
        docs,
        seed_max_len=seed_max_len,
        keep_multi=keep_multi,
        n_rounds=n_rounds,
        text_col=text_col,
    ).collect()
    counts = {r["piece"]: int(r["cnt"]) for r in rows}
    total = sum(counts.values())
    v = len(counts)
    return {p: _ilogp((c + 1.0) / (total + v)) for p, c in counts.items()}


def wordpiece_pieces(
    docs: DataFrame,
    vocab,
    *,
    max_symbols: int | None = None,
    text_col: str = "text",
    eow: str = "</w>",
) -> DataFrame:
    """The SEGMENTATION surface of the production WordPiece apply —
    :func:`wordpiece_greedy_apply`'s greedy longest-match-first fold
    (same candidate order, same all-or-nothing unknown rule), but
    emitting the PIECES with BERT's ``##`` continuation convention
    (Devlin et al. 2019; "playing" → "play ##ing"): the first matched
    piece is emitted bare, every continuation is prefixed ``##``, and
    a word containing any unmatchable symbol emits the single piece
    ``[UNK]``.  Pieces are emitted exactly as matched (base chars +
    merged symbols + the ``eow`` marker, which is part of the trained
    symbol alphabet here — BERT's vocab files instead bake ``##`` into
    the piece strings, a pure re-labelling of the same segmentation).

    Returns one row per DISTINCT corpus word: (w, pieces, n_pieces,
    is_unk) with pieces space-joined — the tokenizer-debug surface a
    curation team reads, and the word→pieces dim a corpus-wide
    tokenize joins against (the same distinct-word discipline as the
    counting apply: each word segments ONCE, pure Catalyst)."""
    pieces = sorted(set(vocab))
    if not pieces:
        raise ValueError("wordpiece_pieces: empty vocabulary")
    if max_symbols is None:
        max_symbols = max(len(p) for p in pieces)
    vmap = F.map_from_arrays(F.lit(list(pieces)), F.lit([1] * len(pieces)))
    distinct_w = docs.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).distinct()
    syms = F.concat(
        F.filter(F.split(F.col("w"), ""), lambda t: t != ""), F.array(F.lit(eow))
    )
    size = F.size(syms)

    def step(acc, _):
        pos, n, unk, out = acc["pos"], acc["n"], acc["unk"], acc["out"]
        branch = F.struct(
            (pos + 1).alias("pos"),
            (n + 1).alias("n"),
            F.lit(True).alias("unk"),
            out.alias("out"),
        )
        for k in range(1, int(max_symbols) + 1):
            piece = F.array_join(F.slice(syms, pos, k), "")
            cond = (pos + k - 1 <= size) & vmap.getItem(piece).isNotNull()
            emitted = F.when(pos == 1, piece).otherwise(
                F.concat(out, F.lit(" ##"), piece)
            )
            branch = F.when(
                cond,
                F.struct(
                    (pos + k).alias("pos"),
                    (n + 1).alias("n"),
                    unk.alias("unk"),
                    emitted.alias("out"),
                ),
            ).otherwise(branch)
        return F.when(pos > size, acc).otherwise(branch)

    init = F.struct(
        F.lit(1).alias("pos"),
        F.lit(0).alias("n"),
        F.lit(False).alias("unk"),
        F.lit("").alias("out"),
    )
    fin = F.aggregate(F.sequence(F.lit(1), size), init, step)
    return distinct_w.select(
        "w",
        F.when(fin["unk"], F.lit("[UNK]")).otherwise(fin["out"]).alias("pieces"),
        F.when(fin["unk"], F.lit(1)).otherwise(fin["n"]).cast("int").alias("n_pieces"),
        fin["unk"].alias("is_unk"),
    )
