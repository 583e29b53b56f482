"""Corpus-curation queries: repetition filter, hash split, stratified
sample, token-shard packing, benchmark contamination.

The curation steps of a training-data pipeline (operators/curation.py)
as oracle-checked registry queries over the documents table.  Parity
notes: all randomness is md5-of-id (identical hex in both engines);
fractions are single double divisions of exact integers; shard math is
integer-exact (`div` / `//`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.plans.registry import query
from geohub_data_pipeline_spark.plans._util import load_tables
from geohub_data_pipeline_spark.functions import text as T
from geohub_data_pipeline_spark.operators import curation as C

_SH = f"""w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
sh AS (
  SELECT doc_id,
         list_transform(
           range(1, least(len(ws) - {T.SHINGLE_WORDS - 1}, {T.MAX_SHINGLES}) + 1),
           i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2]) AS s
  FROM w WHERE len(ws) >= {T.SHINGLE_WORDS}
)"""


_REPETITION_SQL = f"""
WITH {_SH}
SELECT doc_id,
       CAST(len(s) AS INTEGER) AS n_shingles,
       CAST(len(list_distinct(s)) AS INTEGER) AS n_distinct,
       (len(s) - len(list_distinct(s))) / len(s) AS dup_fraction,
       (len(s) - len(list_distinct(s))) / len(s) > 0.2 AS flagged
FROM sh
ORDER BY doc_id
"""


@query("text_repetition_filter", "llm",
       "north star: quality scoring (intra-doc repetition)",
       _REPETITION_SQL)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate word-3-gram fraction per document, with
    a boilerplate flag above 20%.  Map-side only — no shuffle."""
    t = load_tables(spark, sf_dir)
    return C.repetition_stats(t.documents)


_SPLIT_SQL = """
SELECT doc_id,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS hash_bucket,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
            THEN 'train' ELSE 'val' END AS split
FROM documents
ORDER BY doc_id
"""


@query("split_train_val", "llm",
       "north star: corpus management (deterministic split)",
       _SPLIT_SQL)
def split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 87.5/12.5 train/val split from md5(doc_id) —
    stable under reprocessing, independent of corpus contents."""
    t = load_tables(spark, sf_dir)
    return C.hash_split(t.documents)


_STRATIFIED_SQL = """
WITH r AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER)
           AS sample_rank,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT doc_id, source, sample_rank
FROM r WHERE sample_rank <= CAST(ceil(n * 0.1) AS BIGINT)
ORDER BY source, sample_rank
"""


@query("sample_stratified", "llm",
       "north star: corpus management (per-source sampling)",
       _STRATIFIED_SQL)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10% per-source sample ranked by md5(doc_id) — the
    training-mix rebalancing step.  One shuffle keyed on source."""
    t = load_tables(spark, sf_dir)
    return C.stratified_sample(t.documents, "source", 0.1)


_SHARD_CAPACITY = 20_000

_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS tokens FROM documents
),
c AS (
  SELECT doc_id, tokens,
         COALESCE(sum(tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM t
)
SELECT CAST(prev // {_SHARD_CAPACITY} AS INTEGER) AS shard,
       CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY shard
ORDER BY shard
"""


@query("pack_token_shards", "llm",
       "north star: corpus management (token-budget sharding)",
       _PACK_SQL)
def pack_token_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget shard packing (20k whitespace tokens per
    shard), reported as per-shard doc/token totals.

    The prefix sum runs as range-partitioned subtotals + broadcast
    offsets (operators/curation.py) — not a global single-partition
    window — so the same plan packs a 100 TB corpus.
    """
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id",
        T.token_count_whitespace(F.col("text")).cast("long").alias("tokens"))
    packed = C.pack_token_shards(docs, _SHARD_CAPACITY)
    return (
        packed.groupBy("shard")
        .agg(F.count(F.lit(1)).cast("int").alias("n_docs"),
             F.sum("tokens").alias("total_tokens"))
    )


_CONTAMINATION_SQL = f"""
WITH {_SH},
ex AS (SELECT doc_id, unnest(list_distinct(s)) AS shingle FROM sh),
b AS (SELECT doc_id AS bench_id, shingle FROM ex WHERE doc_id % 50 = 0)
SELECT ex.doc_id, b.bench_id, CAST(count(*) AS INTEGER) AS n_shared
FROM ex JOIN b USING (shingle)
WHERE ex.doc_id % 50 <> 0
GROUP BY ex.doc_id, b.bench_id
ORDER BY ex.doc_id, b.bench_id
"""


@query("contamination_ngram", "llm",
       "north star: dedup/contamination (benchmark n-gram overlap)",
       _CONTAMINATION_SQL)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: training docs sharing word
    3-grams with the (every-50th-doc) benchmark set, with distinct
    shared-shingle counts.  Benchmark side broadcast; one count
    shuffle."""
    t = load_tables(spark, sf_dir)
    return C.contamination_pairs(
        t.documents, F.col("doc_id") % 50 == 0)


_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
c AS (SELECT doc_id, term, count(*) AS tc FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id),
dfq AS (SELECT term, count(*) AS dfreq FROM c GROUP BY term),
n AS (SELECT count(*) AS nd FROM documents),
s AS (
  SELECT c.doc_id, c.term,
         (c.tc * n.nd) / (dl.dlen * dfq.dfreq) AS tfidf,
         round(ln(CAST(n.nd AS DOUBLE) / dfq.dfreq), 6) AS idf_log
  FROM c JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN n
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term) AS INTEGER) AS rank
  FROM s
)
SELECT doc_id, term, tfidf, idf_log, rank
FROM r WHERE rank <= 3
ORDER BY doc_id, rank
"""


@query("text_tfidf_top_terms", "llm",
       "north star: text analysis (TF-IDF salient terms)",
       _TFIDF_SQL)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by TF-IDF.

    The RANKING statistic is the exact rational
    ``(term_count * n_docs) / (doc_len * doc_freq)`` — integer
    products with one double division, bit-identical across engines
    (a log-scaled idf is emitted alongside, rounded, for reporting).

    Scale: two keyed shuffles — (doc, term) counts and the term
    document-frequency table; the df join is broadcast-able whenever
    the vocabulary fits (it does: vocab grows ~log of corpus)."""
    t = load_tables(spark, sf_dir)
    docs = t.documents
    n_docs = docs.count()
    tok = docs.select("doc_id",
                      F.explode(F.split(F.col("text"), " ")).alias("term"))
    c = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tc"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    dfq = c.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    s = (
        c.join(dl, "doc_id").join(F.broadcast(dfq), "term")
        .select(
            "doc_id", "term",
            ((F.col("tc") * F.lit(n_docs))
             / (F.col("dlen") * F.col("dfreq"))).alias("tfidf"),
            F.round(F.log(F.lit(float(n_docs)) / F.col("dfreq")), 6)
            .alias("idf_log"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (
        s.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 3)
    )


_MIXTURE_SQL = """
WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS tokens
  FROM documents
),
s AS (
  SELECT source, CAST(count(*) AS INTEGER) AS n_docs,
         CAST(sum(tokens) AS BIGINT) AS n_tokens
  FROM t GROUP BY source
),
g AS (SELECT sum(n_tokens) AS tt, count(*) AS ns FROM s)
SELECT s.source, s.n_docs, s.n_tokens,
       s.n_tokens / CAST(g.tt AS DOUBLE) AS token_frac,
       CAST(g.tt AS DOUBLE) / (g.ns * s.n_tokens) AS up_weight
FROM s CROSS JOIN g
ORDER BY s.source
"""


@query("mixture_weights", "llm",
       "north star: corpus management (training-mix rebalancing)",
       _MIXTURE_SQL)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares and the up/down-weight that equalizes
    the training mix (target = uniform over sources): weight =
    total / (n_sources * source_tokens).  Exact-integer inputs, one
    double division each — bit-identical across engines.

    Scale: one (source)-keyed aggregation; the global totals row is a
    broadcast scalar."""
    t = load_tables(spark, sf_dir)
    per = (
        t.documents
        .select("source",
                T.token_count_whitespace(F.col("text")).alias("tokens"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("int").alias("n_docs"),
             F.sum("tokens").alias("n_tokens"))
    )
    g = per.agg(F.sum("n_tokens").alias("tt"),
                F.count(F.lit(1)).alias("ns"))
    return per.crossJoin(F.broadcast(g)).select(
        "source", "n_docs", "n_tokens",
        (F.col("n_tokens") / F.col("tt").cast("double"))
        .alias("token_frac"),
        (F.col("tt").cast("double") / (F.col("ns") * F.col("n_tokens")))
        .alias("up_weight"),
    )


_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS term
  FROM documents
  CROSS JOIN unnest(range(1, len(string_split(text, ' ')) + 1)) AS u(i)
),
tf AS (SELECT term, count(*) AS tcnt FROM tok GROUP BY term),
g AS (SELECT count(*) AS tt FROM tok),
lp AS (
  SELECT tok.doc_id, tok.pos,
         ln(tf.tcnt / CAST(g.tt AS DOUBLE)) AS l
  FROM tok JOIN tf USING (term) CROSS JOIN g
),
d AS (
  SELECT doc_id,
         CAST(count(*) AS INTEGER) AS n_tokens,
         list_reduce(list(l ORDER BY pos), (x, y) -> x + y) AS s
  FROM lp GROUP BY doc_id
)
SELECT doc_id, n_tokens, round(s / n_tokens, 6) AS avg_logprob
FROM d
ORDER BY doc_id
"""


@query("text_unigram_logprob", "llm",
       "north star: quality scoring (unigram LM log-probability)",
       _LOGPROB_SQL)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document — the classic cheap
    LM quality signal (very low = gibberish / OCR noise; very high =
    repetitive boilerplate).

    Parity: the per-document sum folds the per-token ln() terms in
    POSITION order (collect -> array_sort -> sequential fold, mirrored
    by DuckDB ``list_reduce(list(l ORDER BY pos))``) — never a
    partial-aggregated double sum, whose order is nondeterministic.

    Scale: the term-frequency table is the broadcast side; the
    (doc, pos) rows shuffle once for the per-doc fold."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "term"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tcnt"))
    total = tok.count()
    lp = tok.join(F.broadcast(tf), "term").select(
        "doc_id", "pos",
        F.log(F.col("tcnt") / F.lit(float(total))).alias("l"))
    d = (
        lp.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
             F.aggregate(
                 F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "l"))),
                     lambda s: s["l"]),
                 F.lit(0.0), lambda acc, v: acc + v).alias("s"))
    )
    return d.select(
        "doc_id", "n_tokens",
        F.round(F.col("s") / F.col("n_tokens"), 6).alias("avg_logprob"))


_CDC_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 97 = 0
),
tok AS (
  SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS word
  FROM corpus
  CROSS JOIN unnest(range(1, len(string_split(text, ' ')) + 1)) AS u(i)
),
ck AS (
  SELECT doc_id, pos, word,
         sum(CASE WHEN substring(md5(word), 1, 1) = '0'
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS chunk_id
  FROM tok
),
ch AS (
  SELECT doc_id, chunk_id,
         md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
  FROM ck GROUP BY doc_id, chunk_id
)
SELECT chunk_hash,
       CAST(count(DISTINCT doc_id) AS INTEGER) AS n_docs,
       CAST(count(*) AS INTEGER) AS n_occ,
       min(doc_id) AS first_doc
FROM ch
GROUP BY chunk_hash
HAVING count(DISTINCT doc_id) >= 2
ORDER BY chunk_hash
"""


@query("dedup_cdc_chunks", "llm",
       "north star: sub-document dedup (content-defined chunking)",
       _CDC_SQL)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: content-defined chunking splits every
    document at words whose md5 starts with '0' (1/16 of words =>
    ~16-word expected chunks), hashes each chunk, and reports chunks
    appearing in >= 2 documents — shared boilerplate that whole-doc
    dedup cannot see.  Boundaries depend only on local content, so a
    paragraph shifted by an insertion still chunks identically (the
    rsync/LBFS trick).

    Scale: boundary detection is map-side; chunk assembly is one
    (doc, chunk) shuffle; the chunk-hash census keys on a 32-byte
    hash — uniform by construction."""
    from geohub_data_pipeline_spark.plans.llm import _corpus
    corpus = _corpus(spark, sf_dir)
    ch = C.cdc_chunks(corpus)
    return (
        ch.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").cast("int").alias("n_docs"),
             F.count(F.lit(1)).cast("int").alias("n_occ"),
             F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") >= 2)
    )


_PACK_SEQ_SQL = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS tokens FROM documents
),
c AS (
  SELECT doc_id, CAST(tokens AS BIGINT) AS tokens,
         COALESCE(sum(tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM t
)
SELECT doc_id, tokens,
       CAST(prev // {_SHARD_CAPACITY} AS INTEGER) AS shard,
       CAST(prev % {_SHARD_CAPACITY} AS INTEGER) AS offset
FROM c
ORDER BY doc_id
"""


@query("pack_sequences_offsets", "llm",
       "north star: corpus management (per-doc shard + seek offset)",
       _PACK_SEQ_SQL)
def pack_sequences_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document (shard, within-shard offset) assignment — the
    manifest a training dataloader seeks by.  Same distributed prefix
    sum as ``pack_token_shards`` (range-partitioned subtotals +
    broadcast offsets; no single-partition window), emitted per-row."""
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id",
        T.token_count_whitespace(F.col("text")).cast("long").alias("tokens"))
    return C.pack_token_shards(docs, _SHARD_CAPACITY)


_PII_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.org or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_email,
       CAST(len(regexp_extract_all(t, '\b555-[0-9]{3,4}\b')) AS BIGINT)
         AS n_phone,
       regexp_replace(
         regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g'),
         '\b555-[0-9]{3,4}\b', '<PHONE>', 'g') AS scrubbed
FROM aug
ORDER BY doc_id
"""


@query("text_pii_scrub", "llm",
       "north star: PII redaction scrub (emails/phones) with audit "
       "counts — map-side regex, no shuffle", _PII_SQL)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training PII scrub: redact emails and phone numbers and
    audit how many of each were hit (operators/curation.py
    ``scrub_pii``).  The harness corpus carries no PII, so the query
    plants a deterministic contact line per document first — the
    scrub itself is the generic operator.

    Scale: pure map-side regexp codegen over the text column; zero
    shuffles, cost one corpus scan regardless of pattern count.
    """
    t = load_tables(spark, sf_dir)
    aug = t.documents.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@mail.example.org or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"))
    return (
        C.scrub_pii(aug, "t")
        .select("doc_id", "n_email", "n_phone", "scrubbed")
    )


# ---------------------------------------------------------------------------
# Round-5: the published pre-training filter rule sets as first-class
# operators — Gopher (Rae et al. 2021, "Scaling Language Models",
# §A1.1 quality heuristics) and C4 (Raffel et al. 2020, §2.2
# cleaning rules).  The reference has no analog; these belong to the
# large-scale training-data pipeline family.
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_STOP_LIST = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)

_GOPHER_SQL = f"""
WITH g AS (
  SELECT doc_id,
         string_split(text, ' ') AS ws,
         n_chars,
         CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS INTEGER)
           AS n_symbols
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(ws) AS INTEGER) AS n_words,
         round(CAST(n_chars - (len(ws) - 1) AS DOUBLE) / len(ws), 6)
           AS mean_word_len,
         round(CAST(n_symbols AS DOUBLE) / len(ws), 6) AS symbol_ratio,
         round(CAST(len(list_filter(ws,
               w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
               / len(ws), 6) AS alpha_word_frac,
         CAST(len(list_filter(list_distinct(ws),
              w -> w IN ({_GOPHER_STOP_LIST}))) AS INTEGER)
           AS n_stop_types
  FROM g
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
       n_stop_types,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3 AND 10
        AND symbol_ratio < 0.1
        AND alpha_word_frac >= 0.8
        AND n_stop_types >= 2) AS pass_gopher
FROM m
ORDER BY doc_id
"""


@query("text_gopher_rules", "llm",
       "LLM pipeline: the Gopher quality-filter rule set (word count, "
       "mean word length, symbol ratio, alphabetic fraction, stop-word "
       "diversity) as one map-side pass", _GOPHER_SQL)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality heuristics (Rae et al. 2021 §A1.1) per document:
    50 <= words <= 100k, 3 <= mean word length <= 10, symbol-to-word
    ratio (# and ellipsis) < 0.1, >= 80% of words contain an
    alphabetic character, and at least 2 distinct common stop words —
    the standard first-stage web-corpus filter.

    Scale: every feature is a Catalyst expression over one corpus
    scan (split / regexp / higher-order filter); zero shuffles, zero
    Python.  At 100 TB this is the cheapest possible shape: scan,
    filter map-side, write.
    """
    t = load_tables(spark, sf_dir)
    ws = T.words(F.col("text"))
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    base = t.documents.select(
        "doc_id",
        F.size(ws).cast("int").alias("n_words"),
        F.round((F.col("n_chars") - (F.size(ws) - 1)).cast("double")
                / F.size(ws), 6).alias("mean_word_len"),
        F.round(F.size(F.regexp_extract_all(
            F.col("text"), F.lit(r"#|\.\.\."), 0)).cast("double")
            / F.size(ws), 6).alias("symbol_ratio"),
        F.round(F.size(F.filter(
            ws, lambda w: w.rlike("[a-z]"))).cast("double")
            / F.size(ws), 6).alias("alpha_word_frac"),
        F.size(F.filter(F.array_distinct(ws),
                        lambda w: F.array_contains(stops, w)))
        .cast("int").alias("n_stop_types"),
    )
    return base.select(
        "*",
        (F.col("n_words").between(50, 100000)
         & F.col("mean_word_len").between(3.0, 10.0)
         & (F.col("symbol_ratio") < 0.1)
         & (F.col("alpha_word_frac") >= 0.8)
         & (F.col("n_stop_types") >= 2)).alias("pass_gopher"),
    )


_C4_SQL = """
WITH c AS (
  SELECT doc_id,
         string_split(text, '. ') AS sents,
         string_split(text, ' ') AS ws,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(text, '{') AS has_brace
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(sents) AS INTEGER) AS n_sentences,
         CAST(len(list_filter(sents,
              s -> len(string_split(trim(s), ' ')) >= 5)) AS INTEGER)
           AS n_good_sentences,
         CAST(len(ws) AS INTEGER) AS n_words,
         has_lorem, has_brace
  FROM c
)
SELECT doc_id, n_sentences, n_good_sentences, n_words,
       has_lorem, has_brace,
       (n_sentences >= 3 AND n_good_sentences = n_sentences
        AND NOT has_lorem AND NOT has_brace
        AND n_words >= 50) AS pass_c4
FROM m
ORDER BY doc_id
"""


@query("text_c4_rules", "llm",
       "LLM pipeline: the C4 cleaning rule set (sentence count, "
       "words-per-sentence, lorem-ipsum / code-brace blocklist) as "
       "one map-side pass", _C4_SQL)
def text_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) per document:
    >= 3 sentences, every sentence >= 5 words, no 'lorem ipsum', no
    curly brace (code page marker), >= 50 words.  The harness corpus
    is single-line word soup so most docs fail the sentence rule —
    the rule arithmetic is what the oracle pins.

    Scale: identical shape to the Gopher pass — one scan, all
    Catalyst expressions, no shuffle.
    """
    t = load_tables(spark, sf_dir)
    sents = F.split(F.col("text"), r"\. ")
    ws = T.words(F.col("text"))
    base = t.documents.select(
        "doc_id",
        F.size(sents).cast("int").alias("n_sentences"),
        F.size(F.filter(
            sents,
            lambda s: F.size(F.split(F.trim(s), " ")) >= 5))
        .cast("int").alias("n_good_sentences"),
        F.size(ws).cast("int").alias("n_words"),
        F.lower(F.col("text")).contains("lorem ipsum").alias("has_lorem"),
        F.col("text").contains("{").alias("has_brace"),
    )
    return base.select(
        "*",
        ((F.col("n_sentences") >= 3)
         & (F.col("n_good_sentences") == F.col("n_sentences"))
         & ~F.col("has_lorem") & ~F.col("has_brace")
         & (F.col("n_words") >= 50)).alias("pass_c4"),
    )


_DSIR_SQL = """
WITH tok AS (
  SELECT doc_id, lang = 'en' AS tgt, i AS pos,
         substring(md5(string_split(text, ' ')[i]), 1, 2) AS bucket
  FROM documents
  CROSS JOIN unnest(range(1, len(string_split(text, ' ')) + 1)) AS u(i)
),
counts AS (
  SELECT bucket, count(*) AS cs,
         sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
  FROM tok GROUP BY bucket
),
tot AS (SELECT sum(cs) AS ns, sum(ct) AS nt FROM counts),
llr AS (
  SELECT bucket,
         ln((ct + 1.0) / CAST(nt + 256 AS DOUBLE))
         - ln((cs + 1.0) / CAST(ns + 256 AS DOUBLE)) AS llr
  FROM counts CROSS JOIN tot
)
SELECT t.doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
       round(list_reduce(list(l.llr ORDER BY t.pos),
                         (x, y) -> x + y), 6) AS dsir_logw
FROM tok t JOIN llr l USING (bucket)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@query("text_dsir_weights", "llm",
       "north star: DSIR importance-resampling weights (Xie 2023) — "
       "hashed-unigram bucket LM ratio target-vs-raw, position-"
       "ordered fold", _DSIR_SQL)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log-weights with the English slice as the target
    distribution: documents whose hashed-unigram profile looks like
    the target score high; resampling by these weights is the
    paper's recipe for building a target-matched pretraining mix.
    See ``operators/curation.dsir_weights`` for the distributed
    shape (256-bucket broadcast, map-side bucketing, one per-doc
    fold shuffle).
    """
    t = load_tables(spark, sf_dir)
    return (C.dsir_weights(t.documents, F.col("lang") == "en")
            .orderBy("doc_id"))


_BIGRAM_SQL = """
WITH tok AS (
  SELECT doc_id, lang, i AS pos, string_split(text, ' ')[i] AS term
  FROM documents
  CROSS JOIN unnest(range(1, len(string_split(text, ' ')) + 1)) AS u(i)
),
big AS (
  SELECT t1.doc_id, t1.pos, t1.term, t0.term AS prev
  FROM tok t1
  LEFT JOIN tok t0 ON t0.doc_id = t1.doc_id AND t0.pos = t1.pos - 1
),
ref AS (SELECT term FROM tok WHERE lang = 'en'),
c1 AS (SELECT term, count(*) AS c FROM ref GROUP BY term),
c2 AS (
  SELECT t1.prev, t1.term, count(*) AS c
  FROM (SELECT b.* FROM big b JOIN documents d USING (doc_id)
        WHERE d.lang = 'en' AND b.prev IS NOT NULL) t1
  GROUP BY t1.prev, t1.term
),
g AS (SELECT count(*) AS tt, count(DISTINCT term) AS vv FROM ref),
sc AS (
  SELECT b.doc_id, b.pos,
         CASE WHEN b.prev IS NOT NULL AND bc.c IS NOT NULL
                   AND pu.c IS NOT NULL
              THEN ln(bc.c / CAST(pu.c AS DOUBLE))
              ELSE ln(0.4)
                   + ln((COALESCE(cu.c, 0) + 1.0)
                        / CAST(g.tt + g.vv AS DOUBLE)) END AS l
  FROM big b
  LEFT JOIN c1 cu ON cu.term = b.term
  LEFT JOIN c1 pu ON pu.term = b.prev
  LEFT JOIN c2 bc ON bc.prev = b.prev AND bc.term = b.term
  CROSS JOIN g
),
d AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
         list_reduce(list(l ORDER BY pos), (x, y) -> x + y) AS s
  FROM sc GROUP BY doc_id
)
SELECT doc_id, n_tokens, round(s / n_tokens, 6) AS bigram_logprob
FROM d ORDER BY doc_id
"""


@query("text_bigram_logprob", "llm",
       "north star: bigram LM quality score with Stupid Backoff "
       "(Brants 2007) against a reference slice — unseen bigrams "
       "back off to the smoothed unigram at fixed penalty",
       _BIGRAM_SQL)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram log-probability per document under a language
    model ESTIMATED FROM THE ENGLISH SLICE ONLY and scored over the
    whole corpus — the cross-domain perplexity filter (CCNet's
    KenLM stage, done Spark-first).  In-reference bigrams score
    ln(c2/c1(prev)); anything unseen — out-of-slice bigram, unknown
    previous word, document-initial token — backs off to
    ln(0.4) + smoothed-unigram (Stupid Backoff, the web-scale LM
    that skips normalization entirely).

    Parity: the per-doc sum folds in POSITION order (the
    ``text_unigram_logprob`` determinism contract).  Scale: the
    bigram-count join keys on (prev, term) — one hash shuffle of the
    token stream; the unigram table broadcasts; first-token rows
    need no lookup.
    """
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    tok = t.documents.select(
        "doc_id", "lang",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0",
                                                        "term"),
    ).select("doc_id", "lang", (F.col("pos0") + 1).alias("pos"),
             "term")
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = tok.withColumn("prev", F.lag("term").over(w))

    ref = tok.filter(F.col("lang") == "en")
    c1 = ref.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    c2 = (big.filter((F.col("lang") == "en")
                     & F.col("prev").isNotNull())
          .groupBy("prev", "term").agg(F.count(F.lit(1)).alias("c")))
    tt, vv = ref.agg(F.count(F.lit(1)),
                     F.countDistinct("term")).collect()[0]

    cu = c1.select(F.col("term"), F.col("c").alias("cu_c"))
    pu = c1.select(F.col("term").alias("prev"),
                   F.col("c").alias("pu_c"))
    bc = c2.select("prev", "term", F.col("c").alias("bc_c"))
    sc = (big
          .join(F.broadcast(cu), "term", "left")
          .join(F.broadcast(pu), "prev", "left")
          .join(bc, ["prev", "term"], "left")
          .select(
              "doc_id", "pos",
              F.when(F.col("prev").isNotNull()
                     & F.col("bc_c").isNotNull()
                     & F.col("pu_c").isNotNull(),
                     F.log(F.col("bc_c")
                           / F.col("pu_c").cast("double")))
              .otherwise(
                  F.log(F.lit(0.4))
                  + F.log((F.coalesce(F.col("cu_c"), F.lit(0))
                           + 1.0)
                          / F.lit(float(int(tt) + int(vv)))))
              .alias("l")))
    d = (sc.groupBy("doc_id")
         .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
              F.aggregate(
                  F.transform(
                      F.array_sort(
                          F.collect_list(F.struct("pos", "l"))),
                      lambda s: s["l"]),
                  F.lit(0.0), lambda acc, v: acc + v).alias("s")))
    return d.select(
        "doc_id", "n_tokens",
        F.round(F.col("s") / F.col("n_tokens"), 6)
        .alias("bigram_logprob")).orderBy("doc_id")


_LINE_DEDUP_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
l AS (
  SELECT doc_id, CAST(i AS BIGINT) AS line_no,
         array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS line
  FROM w CROSS JOIN unnest(range(0, (len(ws) + 7) // 8)) u(i)
),
f AS (
  SELECT line, min(doc_id * 1000000 + line_no) AS fk
  FROM l GROUP BY line
),
k AS (
  SELECT l.* FROM l JOIN f
  ON l.line = f.line AND l.doc_id * 1000000 + l.line_no = f.fk
),
t AS (
  SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id
),
ka AS (
  SELECT doc_id, count(*) AS n_kept,
         CAST(sum(length(line)) AS BIGINT) AS kept_chars,
         md5(string_agg(line, chr(10) ORDER BY line_no)) AS kept_hash
  FROM k GROUP BY doc_id
)
SELECT t.doc_id, t.n_lines,
       COALESCE(ka.n_kept, 0) AS n_kept,
       COALESCE(ka.kept_chars, 0) AS kept_chars,
       ka.kept_hash
FROM t LEFT JOIN ka ON t.doc_id = ka.doc_id
ORDER BY t.doc_id
"""


@query("text_line_dedup", "llm",
       "LLM dedup: CCNet-style cross-corpus line dedup — two-phase "
       "groupBy on the line (map-side combine on hot boilerplate), "
       "one join back, per-doc reassembly hash", _LINE_DEDUP_SQL)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet line dedup over the documents corpus, pseudo-lines =
    non-overlapping 8-word windows (the corpus has no newlines; the
    operator is splitter-agnostic).  A line repeated anywhere keeps
    only its first (doc_id, line_no) occurrence; per-doc output
    carries the md5 of the surviving reassembly so the oracle
    verifies CONTENT, not just counts.

    Scale: splitting is pure Catalyst (transform+posexplode over the
    word array); marking is the de-skewed two-phase groupBy + join
    back (never a window over the raw line stream).
    """
    t = load_tables(spark, sf_dir)
    lines = t.documents.select(
        "doc_id",
        F.posexplode(F.expr(
            "transform(sequence(0, (size(split(text, ' ')) + 7) div 8"
            " - 1), i -> array_join(slice(split(text, ' '), i*8 + 1,"
            " 8), ' '))")).alias("line_no", "line"),
    ).select("doc_id", F.col("line_no").cast("long").alias("line_no"),
             "line")
    return C.line_dedup(lines).orderBy("doc_id")


_GROUP_SPLIT_SQL = """
SELECT doc_id, source,
       substr(md5(source), 1, 1) AS hash_bucket,
       CASE WHEN substr(md5(source), 1, 1) < 'e'
            THEN 'train' ELSE 'val' END AS split
FROM documents
ORDER BY doc_id
"""


@query("split_group_aware", "llm",
       "LLM curation: leakage-safe group-aware split — all docs of "
       "a group share one md5-bucket decision; map-side, corpus-"
       "independent", _GROUP_SPLIT_SQL)
def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val split keyed on the source domain (in
    production the group is a near-dup cluster canonical from
    dedup_cluster_canonical — same operator, different key), so eval
    never sees a near-copy of a training document.  Exact md5 parity
    with the oracle."""
    t = load_tables(spark, sf_dir)
    return C.group_aware_split(t.documents, "source").orderBy("doc_id")


_WSAMPLE_SQL = """
WITH docs AS (
  SELECT doc_id,
         CAST(1 + doc_id % 7 AS INTEGER) AS w
  FROM documents
),
keyed AS (
  SELECT doc_id, w,
         (SELECT max(CASE WHEN j < w THEN
              ((SELECT sum(
                  (strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR) || '|'
                                 || CAST(j AS VARCHAR)),
                          CAST(i + 1 AS INTEGER), 1)) - 1)
                  * power(16.0, 12 - i)) FROM range(13) t(i))
               + 0.5) / 4503599627370496.0 END)
          FROM range(7) r(j)) AS key
  FROM docs
)
SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id)
            AS INTEGER) AS rank,
       doc_id, w AS weight
FROM keyed
ORDER BY key DESC, doc_id
LIMIT 64
"""


@query("sample_weighted_topk", "curation",
       "corpus curation: deterministic weighted sampling WITHOUT "
       "replacement (Efraimidis-Spirakis / PPSWOR) — the exact "
       "integer-weight form (key = max of w hash uniforms, the "
       "u^(1/w) law with NO transcendentals, so both engines agree "
       "bit-for-bit); sequence explode + max-agg + global top-k",
       _WSAMPLE_SQL)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Draw 64 documents PPS-without-replacement under importance
    tiers w = 1 + doc_id % 7: higher-weight docs win
    proportionally more often, the draw is reproducible on any
    cluster layout, and the oracle replays the identical keyed
    ranking in SQL."""
    from geohub_data_pipeline_spark.operators import curation as CU

    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", (1 + F.col("doc_id") % 7).cast("int").alias("w"))
    return (CU.weighted_sample_topk(docs, "w", 64)
            .select(F.col("rank").cast("int").alias("rank"),
                    "doc_id", "weight"))


_KEY_SKEW_SQL = """
WITH c AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
r AS (
  SELECT key, cnt,
         CAST(row_number() OVER (ORDER BY cnt, key) AS BIGINT)
         AS rank_asc
  FROM c
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(sum(rank_asc * cnt) AS BIGINT) AS ric
  FROM r
),
t AS (
  SELECT key, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, key DESC)
              AS INTEGER) AS heavy_rank
  FROM c
)
SELECT t.heavy_rank, t.key AS user_id, t.cnt,
       CAST(t.cnt AS DOUBLE) / s.n_rows AS share,
       CAST(sum(t.cnt) OVER (ORDER BY t.heavy_rank) AS DOUBLE)
       / s.n_rows AS cum_share,
       CAST(2 * s.ric - (s.n_keys + 1) * s.n_rows AS DOUBLE)
       / (s.n_keys * s.n_rows) AS gini,
       s.n_keys, s.n_rows
FROM t, s
WHERE t.heavy_rank <= 10
ORDER BY t.heavy_rank
"""


@query("profile_key_skew", "llm",
       "scale diagnostics: key-distribution skew profile — top-10 "
       "heavy keys with exact shares + the exact Gini coefficient "
       "via the integer rank formula; global rank computed with the "
       "distributed prefix pattern (no single-partition window)",
       _KEY_SKEW_SQL)
def profile_key_skew_events(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Skew profile of events.user_id — the pre-flight a 100 TB
    groupBy/join runs to decide whether operators/skew.py salting is
    needed.  Every statistic is integer arithmetic with one final
    division (bit-exact across engines); operators/curation.py
    profile_key_skew.
    """
    from geohub_data_pipeline_spark.operators import curation as CU

    t = load_tables(spark, sf_dir)
    return CU.profile_key_skew(t.events, "user_id", top_k=10)


_KANON_SQL = """
WITH q AS (
  SELECT o_custkey % 50 AS qi_bucket, o_orderpriority AS qi_priority,
         o_orderstatus AS sensitive
  FROM orders
),
cls AS (
  SELECT qi_bucket, qi_priority,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT sensitive) AS BIGINT) AS l_diversity
  FROM q GROUP BY qi_bucket, qi_priority
)
SELECT qi_bucket, qi_priority, class_size, l_diversity,
       class_size < 5 AS violates_k,
       l_diversity < 2 AS violates_l
FROM cls
WHERE class_size < 5 OR l_diversity < 2
ORDER BY qi_bucket, qi_priority
"""


@query("privacy_k_anonymity", "curation",
       "privacy audit: k-anonymity + l-diversity over quasi-"
       "identifier classes — equivalence classes below k=5 members "
       "or below 2 distinct sensitive values, the pre-release check "
       "a training-data pipeline runs before publishing derived "
       "tables; one groupBy, integer counts", _KANON_SQL)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier classes of orders (custkey bucket x
    priority) that violate k-anonymity (fewer than 5 members — the
    class re-identifies its users) or l-diversity (all members share
    one sensitive value — membership leaks the attribute even at
    k >= 5).  The audit is a single groupBy over the
    quasi-identifier tuple with an exact distinct count of the
    sensitive column — the shape that scales to any table width
    because only the QI columns shuffle.
    """
    t = load_tables(spark, sf_dir)
    q = t.orders.select(
        (F.col("o_custkey") % 50).alias("qi_bucket"),
        F.col("o_orderpriority").alias("qi_priority"),
        F.col("o_orderstatus").alias("sensitive"))
    cls = (q.groupBy("qi_bucket", "qi_priority")
           .agg(F.count(F.lit(1)).alias("class_size"),
                F.countDistinct("sensitive").alias("l_diversity")))
    return (cls.select(
        "qi_bucket", "qi_priority", "class_size", "l_diversity",
        (F.col("class_size") < 5).alias("violates_k"),
        (F.col("l_diversity") < 2).alias("violates_l"))
        .filter((F.col("class_size") < 5) | (F.col("l_diversity") < 2))
        .orderBy("qi_bucket", "qi_priority"))


_BM25_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id),
n AS (SELECT (SELECT count(*) FROM documents) AS nd,
             (SELECT count(*) FROM tok) AS tt),
tf AS (
  SELECT doc_id, term, count(*) AS tc FROM tok
  WHERE term IN ('window', 'merge', 'scan') GROUP BY doc_id, term
),
dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
s AS (
  SELECT tf.doc_id,
         CAST(round(
           round(ln((n.nd - dfq.dfreq + 0.5) / (dfq.dfreq + 0.5) + 1.0),
                 6)
           * (tf.tc * 2.2)
           / (tf.tc + 1.2 * (0.25 + 0.75 * dl.dlen
                             / (CAST(n.tt AS DOUBLE) / n.nd)))
           * 1000000.0) AS BIGINT) AS micros
  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN n
),
agg AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_terms,
         CAST(sum(micros) AS BIGINT) AS score_micros
  FROM s GROUP BY doc_id
)
SELECT doc_id, n_terms, score_micros,
       CAST(row_number() OVER (ORDER BY score_micros DESC, doc_id)
            AS INTEGER) AS rank
FROM agg ORDER BY score_micros DESC, doc_id LIMIT 10
"""


@query("text_bm25_topk", "llm",
       "north star: text retrieval (BM25 query ranking) — top-10 "
       "documents for a bag-of-words query, Okapi BM25 with the "
       "Lucene idf variant; per-term scores emitted as integer "
       "micros so the per-document sum is order-independent and "
       "bit-identical across engines", _BM25_SQL)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the query {window, merge, scan} (k1=1.2,
    b=0.75) over the documents table — the full-text ranking
    counterpart of text_tfidf_top_terms' per-document salience.

    Scale: only the query terms' postings shuffle (the isin filter
    sits directly on the exploded tokens); document frequencies come
    from those postings and broadcast; the top-k is a TakeOrdered.
    At 100 TB the cost is O(query-term postings), never O(corpus
    vocabulary)."""
    t = load_tables(spark, sf_dir)
    return C.bm25_topk(t.documents, ["window", "merge", "scan"], k=10)
