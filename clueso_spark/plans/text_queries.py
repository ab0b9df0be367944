"""Text analysis over the ``documents`` table: token stats, n-grams,
quality scoring, language-ID heuristic, fingerprinting.

All built-in Column functions (split/explode/transform/md5) -- zero Python
in the hot path -- with exact ANSI-SQL oracles. Scale: per-doc projections
are embarrassingly parallel; the only shuffles are the groupBys on small
keys (lang, bigram), which partial-aggregate map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clueso_spark.functions.text import (
    STOPWORDS,
    bigrams,
    doc_fingerprint,
    max_multiplicity,
    stopword_count,
    tokens,
    winnow_fingerprint,
    word_shingles,
)
from clueso_spark.plans.catalog import persist_swap as _persist_swap, register
from clueso_spark.sources.tables import load_table, load_table_spread

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "txt_token_stats",
    "Per-document token statistics: token count, distinct-token ratio, "
    "mean token length -- the core text-quality signals.",
    f"""
    with t as (select doc_id, lang, string_split(text, ' ') w, text from documents)
    select doc_id, lang,
           cast(len(w) as bigint) as n_tokens,
           cast(len(list_distinct(w)) as bigint) as n_distinct,
           len(list_distinct(w))::double / len(w) as uniq_ratio,
           (length(text) - len(w) + 1)::double / len(w) as mean_token_len
    from t
    """,
    "text", "projection",
)
def txt_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("w", tokens())
    n_tok = F.size("w")
    n_dis = F.size(F.array_distinct("w"))
    return docs.select(
        "doc_id",
        "lang",
        n_tok.cast("bigint").alias("n_tokens"),
        n_dis.cast("bigint").alias("n_distinct"),
        (n_dis.cast("double") / n_tok).alias("uniq_ratio"),
        # total chars minus the (n-1) separators, per token
        ((F.length("text") - n_tok + 1).cast("double") / n_tok).alias(
            "mean_token_len"
        ),
    )


@register(
    "txt_lang_stats",
    "Corpus profile per language: doc count, exact char sum, mean doc "
    "length, distinct sources.",
    """
    select lang,
           cast(count(*) as bigint) as n_docs,
           cast(sum(n_chars) as bigint) as total_chars,
           cast(sum(n_chars) as double) / count(*) as mean_chars,
           cast(count(distinct source) as bigint) as n_sources
    from documents
    group by lang
    """,
    "text", "aggregate",
)
def txt_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_chars"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
    )


@register(
    "txt_top_bigrams",
    "Top-20 word bigrams: explode adjacent pairs, count, total-ordered "
    "top-k. Scale: map-side partial counts collapse the explosion before "
    "the shuffle; top-k is TakeOrderedAndProject.",
    """
    with t as (select doc_id, string_split(text, ' ') w from documents),
    b as (select unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i + 1])) as bigram
          from t where len(w) >= 2)
    select bigram, cast(count(*) as bigint) as n
    from b group by bigram
    order by n desc, bigram
    limit 20
    """,
    "text", "ngram", "topk",
)
def txt_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("w", tokens())
    return (
        docs.select(F.explode(bigrams("w")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@register(
    "txt_quality_score",
    "Quality scoring: stopword ratio, uniqueness, length band -- the "
    "standard cheap filters applied before LLM training ingestion.",
    f"""
    with t as (select doc_id, n_chars, string_split(text, ' ') w from documents)
    select doc_id,
           cast(len(w) as bigint) as n_tokens,
           cast(len(list_filter(w, x -> x in ({_SW}))) as bigint) as n_stopwords,
           len(list_filter(w, x -> x in ({_SW})))::double / len(w) as stopword_ratio,
           len(list_distinct(w))::double / len(w) as uniq_ratio,
           case when n_chars between 200 and 400 then 'good'
                when n_chars < 200 then 'short' else 'long' end as length_band,
           cast(case when len(list_filter(w, x -> x in ({_SW})))::double / len(w) > 0.05
                 and len(list_distinct(w))::double / len(w) > 0.2
                then 1 else 0 end as bigint) as keep
    from t
    """,
    "text", "quality",
)
def txt_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("w", tokens())
    n_tok = F.size("w")
    n_stop = stopword_count("w")
    stop_ratio = n_stop.cast("double") / n_tok
    uniq_ratio = F.size(F.array_distinct("w")).cast("double") / n_tok
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        F.when(F.col("n_chars").between(200, 400), "good")
        .when(F.col("n_chars") < 200, "short")
        .otherwise("long")
        .alias("length_band"),
        F.when((stop_ratio > 0.05) & (uniq_ratio > 0.2), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("keep"),
    )


@register(
    "txt_langid_heuristic",
    "n-gram/stopword language-ID heuristic: score = stopword hits per "
    "token, guess 'en' above threshold else 'und'; reports agreement with "
    "the labeled lang column.",
    f"""
    with t as (select doc_id, lang, string_split(text, ' ') w from documents),
    s as (select doc_id, lang,
                 len(list_filter(w, x -> x in ({_SW})))::double / len(w) as sw_ratio
          from t)
    select case when sw_ratio >= 0.08 then 'en' else 'und' end as guessed,
           lang as labeled,
           cast(count(*) as bigint) as n_docs
    from s group by 1, 2
    """,
    "text", "langid", "aggregate",
)
def txt_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("w", tokens())
    sw_ratio = stopword_count("w").cast("double") / F.size("w")
    return (
        docs.select(
            F.when(sw_ratio >= 0.08, "en").otherwise("und").alias("guessed"),
            F.col("lang").alias("labeled"),
        )
        .groupBy("guessed", "labeled")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


@register(
    "txt_fingerprints",
    "Document fingerprinting: exact md5 fingerprint + rolling-hash "
    "winnowing fingerprint (min md5 over 5-gram windows) per doc.",
    """
    with t as (select doc_id, text, string_split(text, ' ') w from documents)
    select doc_id,
           md5(lower(text)) as exact_fp,
           case when len(w) < 5 then md5(array_to_string(w, ' '))
                else list_aggregate(
                  list_transform(range(1, len(w) - 3),
                    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                             || w[i+3] || ' ' || w[i+4])), 'min') end as winnow_fp
    from t
    """,
    "text", "fingerprint",
)
def txt_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("w", tokens())
    return docs.select(
        "doc_id",
        doc_fingerprint().alias("exact_fp"),
        winnow_fingerprint("w", 5).alias("winnow_fp"),
    )


@register(
    "txt_regex_token_count",
    "BPE-ish regex token counting: alpha runs, digit runs, and residual "
    "non-space symbols counted separately (regexp stays JVM-side).",
    r"""
    select doc_id,
           cast(len(regexp_extract_all(text, '[a-z]+')) as bigint) as n_alpha,
           cast(len(regexp_extract_all(text, '[0-9]+')) as bigint) as n_digit,
           cast(len(regexp_extract_all(text, '[^a-z0-9 ]')) as bigint) as n_symbol
    from documents
    """,
    "text", "regex",
)
def txt_regex_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit("[a-z]+")).cast("bigint").alias("n_alpha"),
        F.regexp_count("text", F.lit("[0-9]+")).cast("bigint").alias("n_digit"),
        F.regexp_count("text", F.lit("[^a-z0-9 ]")).cast("bigint").alias("n_symbol"),
    )


SPLIT_ORACLE = """
with h as (
  select doc_id, lang, n_chars,
         cast(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8)) as bigint)
           % 100 as pct
  from documents
),
s as (
  select case when pct < 80 then 'train'
              when pct < 90 then 'valid'
              else 'test' end as split,
         lang, n_chars
  from h
)
select split, lang,
       cast(count(*) as bigint) as n_docs,
       cast(sum(n_chars) as bigint) as total_chars
from s
group by split, lang
"""


@register(
    "pipeline_train_test_split",
    "Deterministic hash-based train/valid/test split (80/10/10): "
    "md5(doc_id) -> 32-bit int -> percentile bucket. Content-addressed "
    "splitting is THE reproducible pattern at 100 TB -- no sampling "
    "state, no seed coordination across executors; any engine recomputes "
    "the same assignment per document. Output: per-split per-language "
    "doc and char volumes.",
    SPLIT_ORACLE,
    "pipeline", "split", "text",
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pct = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(pct < 80, "train").when(pct < 90, "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


TFDF_ORACLE = """
with words as (
  select doc_id, unnest(string_split(text, ' ')) as term from documents
),
tf as (select doc_id, term, count(*) as tf from words group by doc_id, term),
df as (select term, count(*) as df from tf group by term),
ranked as (
  select t.doc_id, t.term, t.tf, d.df,
         cast(t.tf as double) / d.df as score,
         row_number() over (partition by t.doc_id
                            order by cast(t.tf as double) / d.df desc, t.term)
           as rk
  from tf t join df d on t.term = d.term
)
select doc_id, term,
       cast(tf as bigint) as tf,
       cast(df as bigint) as df,
       score
from ranked where rk <= 3
"""


@register(
    "txt_tf_df_top_terms",
    "TF/DF term salience (tf-idf plan shape with a division-only score "
    "so both engines agree bit-for-bit; ln(idf) would differ in the last "
    "ulp across libm implementations): per-doc term frequencies joined "
    "to corpus document frequencies, top-3 salient terms per doc. Two "
    "keyed aggregations + one term-keyed join + per-doc top-k window -- "
    "the inverted-index build plan.",
    TFDF_ORACLE,
    "text", "tfidf", "topk",
)
def txt_tf_df_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "score",
        )
    )


CHUNK_ORACLE = """
with t as (select doc_id, string_split(text, ' ') as w from documents),
c as (
  select doc_id, w, s as start
  from t cross join unnest(range(1, greatest(len(w) - 99, 1) + 1, 80)) as u(s)
)
select doc_id,
       cast((start - 1) // 80 as bigint) as chunk_idx,
       cast(start as bigint) as start_word,
       cast(len(w[start:start+99]) as bigint) as n_chunk_words,
       md5(array_to_string(w[start:start+99], ' ')) as chunk_md5
from c
"""


@register(
    "pipeline_doc_chunking",
    "Document chunking for training windows: 100-word chunks with "
    "20-word overlap (stride 80) via sequence+explode+slice -- pure JVM "
    "row generation, one narrow pass, no Python. Chunks are emitted as "
    "md5 fingerprints so the verification payload stays small; a real "
    "pipeline would carry the chunk text column to the tokenizer. Short "
    "docs yield one partial chunk (a real tokenizer pads).",
    CHUNK_ORACLE,
    "pipeline", "text", "chunking",
)
def pipeline_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("w") - 99, F.lit(1)), F.lit(80)
    )
    chunk = F.slice("w", F.col("start"), 100)
    return (
        docs.withColumn("start", F.explode(starts))
        .select(
            "doc_id",
            F.expr("(start - 1) div 80").cast("bigint").alias("chunk_idx"),
            F.col("start").cast("bigint").alias("start_word"),
            F.size(chunk).cast("bigint").alias("n_chunk_words"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


REPETITION_ORACLE = """
with t as (select doc_id, string_split(text, ' ') w from documents),
g as (
  select doc_id, w, len(w) as n_tokens,
         list_max(list_transform(list_distinct(w),
                  t -> len(list_filter(w, x -> x = t)))) as top_uni,
         case when len(w) < 2 then []
              else list_transform(range(1, len(w)),
                   i -> w[i] || ' ' || w[i + 1]) end as bi,
         case when len(w) < 3 then []
              else list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) end as tri
  from t
),
s as (
  select doc_id, n_tokens, top_uni,
         case when len(bi) = 0 then 0
              else list_max(list_transform(list_distinct(bi),
                   t -> len(list_filter(bi, x -> x = t)))) end as top_bi,
         len(bi) as n_bi, len(tri) as n_tri,
         len(list_distinct(tri)) as n_tri_distinct
  from g
)
select doc_id,
       cast(n_tokens as bigint) as n_tokens,
       cast(top_uni as double) / n_tokens as top_unigram_frac,
       case when n_bi = 0 then 0.0
            else cast(top_bi as double) / n_bi end as top_bigram_frac,
       case when n_tri = 0 then 0.0
            else 1.0 - cast(n_tri_distinct as double) / n_tri
       end as dup_trigram_frac,
       cast(case when cast(top_uni as double) / n_tokens > 0.2
                  or (n_tri > 0 and
                      1.0 - cast(n_tri_distinct as double) / n_tri > 0.5)
            then 1 else 0 end as bigint) as repetitive
from s
"""


@register(
    "txt_repetition_signals",
    "Gopher-style repetition signals per document: most-frequent-unigram "
    "fraction, most-frequent-bigram fraction, duplicate-trigram fraction, "
    "and a repetitive flag -- the standard quality filters that catch "
    "boilerplate/spam before LLM training. Pure per-row array algebra "
    "(cost bounded by doc length, which is bounded): NO shuffle at all -- "
    "at 100 TB this is a narrow embarrassingly-parallel projection, "
    "unlike the explode+groupBy formulation which would shuffle every "
    "token.",
    REPETITION_ORACLE,
    "text", "quality", "pipeline",
)
def txt_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file local scans get 1 task; spread the O(len^2/doc)
    # array-algebra projection across cores (input-adaptive: a wide
    # cluster scan skips the shuffle)
    docs = (
        load_table_spread(spark, sf_dir, "documents")
        .withColumn("w", tokens())
    )
    g = docs.select(
        "doc_id",
        "w",
        F.size("w").alias("n_tokens"),
        max_multiplicity("w").alias("top_uni"),
        bigrams("w").alias("bi"),
        word_shingles("w", 3).alias("tri"),
    )
    s = g.select(
        "doc_id",
        "n_tokens",
        "top_uni",
        max_multiplicity("bi").alias("top_bi"),
        F.size("bi").alias("n_bi"),
        F.size("tri").alias("n_tri"),
        F.size(F.array_distinct("tri")).alias("n_tri_distinct"),
    )
    uni_frac = F.col("top_uni").cast("double") / F.col("n_tokens")
    tri_dup = F.lit(1.0) - F.col("n_tri_distinct").cast("double") / F.col(
        "n_tri"
    )
    return s.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        uni_frac.alias("top_unigram_frac"),
        F.when(F.col("n_bi") == 0, F.lit(0.0))
        .otherwise(F.col("top_bi").cast("double") / F.col("n_bi"))
        .alias("top_bigram_frac"),
        F.when(F.col("n_tri") == 0, F.lit(0.0))
        .otherwise(tri_dup)
        .alias("dup_trigram_frac"),
        F.when(
            (uni_frac > 0.2) | ((F.col("n_tri") > 0) & (tri_dup > 0.5)), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("repetitive"),
    )


CONTAMINATION_ORACLE = """
with h as (
  select doc_id, string_split(text, ' ') w,
         cast(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8)) as bigint)
           % 100 as pct
  from documents
),
g as (
  select doc_id, pct,
         case when len(w) < 3 then []
              else list_distinct(list_transform(range(1, len(w) - 1),
                   i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) end
           as grams
  from h
),
train_grams as (
  select distinct unnest(grams) as gram from g where pct < 80
),
test_grams as (
  select doc_id, unnest(grams) as gram from g where pct >= 90
),
hits as (
  select t.doc_id, count(*) as n_hit
  from test_grams t join train_grams tr on t.gram = tr.gram
  group by t.doc_id
),
totals as (
  select doc_id, len(grams) as n_grams from g where pct >= 90
)
select t.doc_id,
       cast(t.n_grams as bigint) as n_grams,
       cast(coalesce(h.n_hit, 0) as bigint) as n_contaminated,
       case when t.n_grams = 0 then 0.0
            else cast(coalesce(h.n_hit, 0) as double) / t.n_grams
       end as contamination_rate,
       cast(case when t.n_grams > 0 and
                  cast(coalesce(h.n_hit, 0) as double) / t.n_grams > 0.8
            then 1 else 0 end as bigint) as contaminated
from totals t left join hits h on t.doc_id = h.doc_id
"""


@register(
    "pipeline_contamination_check",
    "Train/test decontamination sweep: distinct 3-gram fingerprints of "
    "every test-split document joined against the train split's distinct "
    "3-gram set (the same content-addressed 80/10/10 split as "
    "pipeline_train_test_split); reports per-test-doc overlap rate and a "
    "contaminated flag. The benchmark-decontamination pass every LLM "
    "training pipeline runs (production uses 8-13-grams; 3 here so the "
    "tiny synthetic vocab yields non-degenerate rates). Scale: gram sets "
    "are per-row array algebra; the only corpus-wide movement is ONE "
    "keyed shuffle of (doc, gram-md5) rows into the gram equi-join, and "
    "the train side deduplicates map-side before shuffling.",
    CONTAMINATION_ORACLE,
    "pipeline", "dedup", "text",
)
def pipeline_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three branches (train grams, test grams, totals) each pay the
    # per-doc gram+md5 projection; spread single-file local scans across
    # cores so no branch serializes on one task
    docs = (
        load_table_spread(spark, sf_dir, "documents")
        .withColumn("w", tokens())
    )
    pct = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    grams = F.array_distinct(F.transform(word_shingles("w", 3), F.md5))
    g = docs.select("doc_id", pct.alias("pct"), grams.alias("grams"))
    train_grams = (
        g.where(F.col("pct") < 80)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    test = g.where(F.col("pct") >= 90)
    test_grams = test.select("doc_id", F.explode("grams").alias("gram"))
    hits = (
        test_grams.join(train_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    totals = test.select("doc_id", F.size("grams").alias("n_grams"))
    rate = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_grams")
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_contaminated"),
        rate.alias("contamination_rate"),
        F.when((F.col("n_grams") > 0) & (rate > 0.8), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("contaminated"),
    )


MIXTURE_ORACLE = """
with stats as (
  select source, count(*) as n_before, sum(n_chars) as chars_before
  from documents group by source
),
m as (select min(chars_before) as min_chars from stats),
thr as (
  select source, n_before, chars_before,
         least(10000, min_chars * 10000 // chars_before) as threshold_bp
  from stats cross join m
),
kept as (
  select d.source,
         case when cast(('0x' || substr(md5('mix_' || cast(d.doc_id as varchar)), 1, 8))
                   as bigint) % 10000 < t.threshold_bp
              then 1 else 0 end as keep,
         d.n_chars
  from documents d join thr t on d.source = t.source
)
select t.source,
       cast(t.n_before as bigint) as n_before,
       cast(t.chars_before as bigint) as chars_before,
       cast(t.threshold_bp as bigint) as threshold_bp,
       cast(sum(k.keep) as bigint) as n_after,
       cast(sum(k.keep * k.n_chars) as bigint) as chars_after
from kept k join thr t on k.source = t.source
group by t.source, t.n_before, t.chars_before, t.threshold_bp
"""


@register(
    "pipeline_mixture_reweight",
    "Deterministic domain-mixture rebalancing: every source is hash-"
    "downsampled so its expected character volume matches the smallest "
    "source's (threshold in integer basis points -- exact cross-engine "
    "parity, no float rates). The corpus-mixing step before training "
    "shards are cut; content-addressed sampling means any engine "
    "recomputes the same per-doc keep decision with no seed state. "
    "Scale: one small per-source aggregate broadcast back onto the "
    "corpus scan -- the fact table shuffles zero times before the final "
    "per-source rollup (map-side combined).",
    MIXTURE_ORACLE,
    "pipeline", "sampling", "text",
)
def pipeline_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_before"),
        F.sum("n_chars").alias("chars_before"),
    )
    m = stats.agg(F.min("chars_before").alias("min_chars"))
    thr = stats.crossJoin(F.broadcast(m)).select(
        "source",
        "n_before",
        "chars_before",
        F.least(
            F.lit(10000),
            F.expr("min_chars * 10000 div chars_before"),
        ).alias("threshold_bp"),
    )
    pct = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    kept = docs.join(F.broadcast(thr), "source").select(
        "source",
        "n_before",
        "chars_before",
        "threshold_bp",
        F.when(pct < F.col("threshold_bp"), 1).otherwise(0).alias("keep"),
        "n_chars",
    )
    return kept.groupBy(
        "source", "n_before", "chars_before", "threshold_bp"
    ).agg(
        F.sum("keep").cast("bigint").alias("n_after"),
        F.sum(F.col("keep") * F.col("n_chars"))
        .cast("bigint")
        .alias("chars_after"),
    ).select(
        "source",
        F.col("n_before").cast("bigint").alias("n_before"),
        F.col("chars_before").cast("bigint").alias("chars_before"),
        F.col("threshold_bp").cast("bigint").alias("threshold_bp"),
        "n_after",
        "chars_after",
    )


PACKING_ORACLE = """
with t as (
  select doc_id, len(string_split(text, ' ')) as n_tokens from documents
),
c as (
  select doc_id, n_tokens,
         sum(n_tokens) over (order by doc_id
                             rows between unbounded preceding and current row)
           as cum
  from t
),
assigned as (
  select doc_id, n_tokens, (cum - n_tokens) // 4096 as pack_id from c
)
select cast(pack_id as bigint) as pack_id,
       cast(count(*) as bigint) as n_docs,
       cast(sum(n_tokens) as bigint) as total_tokens,
       cast(min(doc_id) as bigint) as first_doc,
       cast(max(doc_id) as bigint) as last_doc
from assigned
group by pack_id
"""


@register(
    "pipeline_sequence_packing",
    "Sequence packing into 4096-token context windows: deterministic "
    "contiguous packing by doc_id order -- each doc joins the pack its "
    "cumulative start offset falls in (integer math end to end). The "
    "cumsum is the scale-safe ranged form (functions/ordered.py): "
    "range-repartition on doc_id, per-partition running sums, broadcast "
    "prefix offsets -- identical values to a global window cumsum with "
    "NO single-partition stage, so the packing layout step before "
    "training-shard writes parallelizes at 100 TB.",
    PACKING_ORACLE,
    "pipeline", "text", "packing",
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clueso_spark.functions.ordered import ranged_cumsum

    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    c = ranged_cumsum(t, ["doc_id"], "n_tokens", "cum")
    return (
        c.withColumn(
            "pack_id", F.expr("(cum - n_tokens) div 4096").cast("bigint")
        )
        .groupBy("pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
    )


STRAT_ORACLE = """
with c as (select lang, count(*) as n from documents group by lang),
m as (select min(n) as mn from c),
r as (select lang, n, (mn * 10000) // n as rate_bp from c cross join m),
k as (
  select d.lang,
         case when cast(('0x' || substr(md5('strat_' || cast(d.doc_id as varchar)), 1, 8))
                    as bigint) % 10000 < r.rate_bp
              then 1 else 0 end as keep
  from documents d join r on d.lang = r.lang
)
select r.lang, cast(r.n as bigint) as n_total,
       cast(sum(k.keep) as bigint) as n_sampled,
       cast(r.rate_bp as bigint) as rate_bp
from k join r on k.lang = r.lang
group by r.lang, r.n, r.rate_bp
"""


@register(
    "pipeline_stratified_sample",
    "Stratified (language-equalized) sampling: per-stratum keep rate = "
    "min-stratum-count / stratum-count in integer basis points, "
    "membership by content hash (md5(doc_id) mod 10000 < rate_bp). "
    "Deterministic -- no sampling state, no seeds, any engine recomputes "
    "the identical sample. The rate table is |strata| rows, broadcast "
    "to a map-side filter; at 100 TB the corpus is scanned once and "
    "never shuffled (only the tiny per-stratum counts aggregate moves).",
    STRAT_ORACLE,
    "pipeline", "sampling", "text",
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    m = c.agg(F.min("n").alias("mn"))
    rates = c.crossJoin(F.broadcast(m)).select(
        "lang", "n", F.expr("(mn * 10000) div n").alias("rate_bp")
    )
    bp = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat_"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    keep = F.when(bp < F.col("rate_bp"), 1).otherwise(0)
    return (
        docs.join(F.broadcast(rates), "lang")
        .select("lang", "n", "rate_bp", keep.alias("keep"))
        .groupBy("lang", "n", "rate_bp")
        .agg(F.sum("keep").cast("bigint").alias("n_sampled"))
        .select(
            "lang",
            F.col("n").cast("bigint").alias("n_total"),
            "n_sampled",
            F.col("rate_bp").cast("bigint").alias("rate_bp"),
        )
    )


#: sources scrubbed from the curated corpus (the URL/domain-blocklist
#: filtering step of a web-scale pipeline, expressed over the `source`
#: attribute; a real deployment broadcasts a blocklist dimension of
#: domains exactly like this)
BLOCKED_SOURCES = ("src3", "src7", "src11", "srcX")

_BLOCKLIST_ORACLE = f"""
select lang,
       cast(count(*) as bigint) as n_docs,
       cast(sum(n_chars) as bigint) as total_chars,
       cast(count(distinct source) as bigint) as n_sources
from documents
where source not in {BLOCKED_SOURCES!r}
group by lang
"""


@register(
    "pipeline_domain_blocklist",
    "Domain/source blocklist filtering: docs from blocked sources are "
    "scrubbed via a broadcast ANTI join against the blocklist dimension "
    "(never an IN-subquery shuffle); survivors aggregate per language. "
    "At 100 TB the blocklist (even millions of domains) broadcasts and "
    "the corpus is scanned once, map-side only.",
    _BLOCKLIST_ORACLE,
    "pipeline", "filtering", "text",
)
def pipeline_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    block = spark.createDataFrame(
        [(s,) for s in BLOCKED_SOURCES], ["source"]
    )
    return (
        docs.join(F.broadcast(block), "source", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
        )
    )


#: PII patterns, identical Java-regex / RE2 semantics (no lookaround,
#: no engine-specific classes). Applied in this order.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"
PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

#: deterministic PII-bearing fixture rows UNIONed with the corpus: the
#: synthetic corpus contains no PII (all-lowercase word salad), so these
#: literals are what force the match/redact path through both engines --
#: the cross-engine hash then verifies actual redaction behavior, not
#: just zeros.
PII_FIXTURES = [
    (-1, "contact alice@example.com or bob.smith@mail.co today", "fixture"),
    (-2, "call 555-867-5309 re the server at 192.168.0.1 now", "fixture"),
    (-3, "two mails x@y.io z@w.dev one phone 111-222-3333", "fixture"),
    (-4, "clean row with no personal data at all", "fixture"),
]

_PII_FIXTURE_SQL = " union all ".join(
    f"select {i} as doc_id, '{t}' as text, '{s}' as source"
    for i, t, s in PII_FIXTURES
)

_PII_ORACLE = f"""
with corpus as (
  select doc_id, text, source from documents
  union all {_PII_FIXTURE_SQL}
),
r as (
  select source,
         len(regexp_extract_all(text, '{PII_EMAIL}')) as n_em,
         len(regexp_extract_all(text, '{PII_PHONE}')) as n_ph,
         len(regexp_extract_all(
           regexp_replace(text, '{PII_PHONE}', '<PII>', 'g'), '{PII_IP}')) as n_ip,
         length(text) - length(
           regexp_replace(regexp_replace(regexp_replace(
             text, '{PII_EMAIL}', '<PII>', 'g'),
                   '{PII_PHONE}', '<PII>', 'g'),
                   '{PII_IP}', '<PII>', 'g')) as chars_delta
  from corpus
)
select source, cast(count(*) as bigint) as n_docs,
       cast(sum(n_em) as bigint) as n_emails,
       cast(sum(n_ph) as bigint) as n_phones,
       cast(sum(n_ip) as bigint) as n_ips,
       cast(sum(chars_delta) as bigint) as chars_removed
from r group by source
"""


@register(
    "txt_pii_redaction",
    "PII detection + redaction (emails, phone numbers, IPv4): "
    "regexp_count per pattern and sequential regexp_replace to '<PII>', "
    "aggregated per source. Patterns are lookaround-free so Java regex "
    "(Spark, codegen'd JVM-side) and RE2 (DuckDB) agree exactly; "
    "deterministic PII-bearing fixture rows are unioned in so the "
    "match/redact path itself is hash-verified, not just the zero case. "
    "Pure column algebra: one scan, one small aggregate -- at 100 TB "
    "this is a map-only pass.",
    _PII_ORACLE,
    "text", "pii", "llm-pipeline",
)
def txt_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    fixtures = spark.createDataFrame(
        PII_FIXTURES, ["doc_id", "text", "source"]
    )
    corpus = docs.unionByName(fixtures)
    # phone strip first for the IP count: '555-867-5309' must not feed
    # digit runs into the IPv4 pattern (same order as the oracle)
    no_phone = F.regexp_replace("text", F.lit(PII_PHONE), F.lit("<PII>"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", F.lit(PII_EMAIL), F.lit("<PII>")),
            F.lit(PII_PHONE),
            F.lit("<PII>"),
        ),
        F.lit(PII_IP),
        F.lit("<PII>"),
    )
    return (
        corpus.select(
            "source",
            F.regexp_count("text", F.lit(PII_EMAIL)).alias("n_em"),
            F.regexp_count("text", F.lit(PII_PHONE)).alias("n_ph"),
            F.regexp_count(no_phone, F.lit(PII_IP)).alias("n_ip"),
            (F.length("text") - F.length(redacted)).alias("chars_delta"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_em").cast("bigint").alias("n_emails"),
            F.sum("n_ph").cast("bigint").alias("n_phones"),
            F.sum("n_ip").cast("bigint").alias("n_ips"),
            F.sum("chars_delta").cast("bigint").alias("chars_removed"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters: the fixed-size frequency sketch
# (Cormode & Muthukrishnan 2005). The sketch is d x w counters TOTAL --
# independent of corpus size -- and merges by cell-wise addition, which
# is what makes it the streaming/distributed answer to "top terms" when
# an exact per-term groupBy's key space would not fit. Here both the
# sketch estimate AND the exact count are computed so the oracle
# verifies the estimator's defining guarantee cell-for-cell:
# exact <= estimate (one-sided error).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  #: independent hash rows
CMS_WIDTH = 256  #: counters per row
CMS_TOP = 20  #: heavy hitters reported


def _cms_bucket_sql(row: int) -> str:
    """DuckDB: term's counter index in sketch row ``row``."""
    return (
        f"cast(('0x' || substr(md5('cms{row}_' || term), 1, 8)) as bigint)"
        f" % {CMS_WIDTH}"
    )


_CMS_ORACLE = f"""
with words as (
  select unnest(string_split(text, ' ')) as term from documents
),
exact as (select term, count(*) as exact_n from words group by term),
cells as (
  select r.range as row_id, {
    "case r.range "
    + " ".join(
        f"when {r} then " + _cms_bucket_sql(r) for r in range(CMS_DEPTH)
    )
    + " end"
  } as bucket, count(*) as c
  from words cross join range({CMS_DEPTH}) r
  group by 1, 2
),
est as (
  select e.term, e.exact_n,
         min(c.c) as cms_estimate
  from exact e
  join cells c
    on c.bucket = case c.row_id {
      " ".join(
        f"when {r} then "
        + _cms_bucket_sql(r).replace("term", "e.term")
        for r in range(CMS_DEPTH)
      )
    } end
  group by e.term, e.exact_n
)
select term, cast(cms_estimate as bigint) as cms_estimate,
       cast(exact_n as bigint) as exact_n,
       cast(cms_estimate - exact_n as bigint) as overcount
from est
order by cms_estimate desc, term
limit {CMS_TOP}
"""


@register(
    "txt_cms_heavy_hitters",
    f"Count-min sketch heavy hitters: a {CMS_DEPTH}x{CMS_WIDTH}-counter "
    "sketch (md5-salted row hashes) built in ONE keyed aggregate, then "
    f"every term's estimate = min over its {CMS_DEPTH} counters; top-"
    f"{CMS_TOP} by estimate with the exact count alongside. The sketch "
    "is FIXED-SIZE regardless of corpus (cells merge by addition -- "
    "map-side partial agg IS the merge), and the tiny sketch broadcasts "
    "back onto the term dictionary for estimation. The oracle verifies "
    "the one-sided guarantee (estimate >= exact) value-for-value.",
    _CMS_ORACLE,
    "text", "sketch", "heavy-hitters",
)
def txt_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens("text")).alias("term"))
    exact = words.groupBy("term").agg(F.count("*").alias("exact_n"))

    def bucket(row: int, term_col: str = "term") -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{row}_"), F.col(term_col))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % CMS_WIDTH
        )

    # sketch build: explode each token into its d (row, bucket) cells,
    # ONE aggregate -- partial aggregation merges per-partition sketches
    # map-side exactly like distributed CMS merge
    cells = (
        words.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row_id"),
                            bucket(r).alias("bucket"),
                        )
                        for r in range(CMS_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        .groupBy("cell.row_id", "cell.bucket")
        .agg(F.count("*").alias("c"))
    )
    # estimate: each term joins its d cells (the sketch is d*w rows --
    # broadcast), estimate = min over rows
    probe = exact.select(
        "term",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("p_row"), bucket(r).alias("p_bucket")
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    )
    return (
        probe.join(
            F.broadcast(cells),
            (F.col("p.p_row") == F.col("row_id"))
            & (F.col("p.p_bucket") == F.col("bucket")),
        )
        .groupBy("term", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
        .orderBy(F.col("cms_estimate").desc(), "term")
        .limit(CMS_TOP)
        .select(
            "term",
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            F.col("exact_n").cast("bigint").alias("exact_n"),
            (F.col("cms_estimate") - F.col("exact_n"))
            .cast("bigint")
            .alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM perplexity scoring (the CCNet/KenLM quality-filter shape:
# score each document by how surprising its tokens are under a language
# model; here the LM is the corpus's own unigram distribution).
# ---------------------------------------------------------------------------

PPLX_ORACLE = """
with t as (select doc_id, string_split(text, ' ') w from documents),
tok as (select doc_id, unnest(w) as term from t),
tf as (select term, count(*) as c from tok group by term),
tot as (select cast(round(log2(sum(c)) * 1000000) as bigint) as l_total
        from tf),
lp as (select term, cast(round(log2(c) * 1000000) as bigint) as lp from tf),
pd as (select doc_id, count(*) as n, sum(lp) as s
       from tok join lp using (term) group by doc_id)
select doc_id,
       cast(n as bigint) as n_tokens,
       (n * l_total - s) / (n * 1000000.0) as xent_bits
from pd cross join tot
"""


@register(
    "txt_perplexity_proxy",
    "Unigram-LM cross-entropy per document (the CCNet-style perplexity "
    "quality filter): train unigram log-probs on the corpus in ONE "
    "term-count aggregate, then score every doc as the mean surprisal "
    "-log2 p(term) of its tokens. Log-probs are micro-bit integers "
    "(round(log2(c)*1e6)) so the per-doc sum is an EXACT bigint "
    "aggregate -- order-independent, engine-independent -- and the "
    "final division's operands are identical in both engines. Scale: "
    "the vocabulary is sublinear but NOT bounded (Heaps' law puts the "
    "raw token vocab at 1e8-1e9 terms at 100 TB), so the term->logprob "
    "map joins on term WITHOUT a broadcast hint -- AQE broadcasts it "
    "from measured runtime size while it is genuinely small and "
    "shuffle-joins past that; the shuffles are the term count, the "
    "scoring join, and the per-doc sum, all keyed.",
    PPLX_ORACLE,
    "text", "quality", "language-model",
)
def txt_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens().alias("w")
    )
    tok = docs.select("doc_id", F.explode("w").alias("term"))
    tf = tok.groupBy("term").agg(F.count("*").alias("c"))
    # total-token log in micro-bits: one scalar row, broadcast
    tot = tf.agg(
        F.round(F.log2(F.sum("c")) * 1e6).cast("bigint").alias("l_total")
    )
    lp = tf.select(
        "term", F.round(F.log2("c") * 1e6).cast("bigint").alias("lp")
    )
    # no broadcast hint: lp is vocabulary-sized (unbounded at 100 TB);
    # AQE picks broadcast vs shuffle from the aggregate's runtime size
    pd = (
        tok.join(lp, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("lp").alias("s"),
        )
    )
    return pd.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        (
            (F.col("n") * F.col("l_total") - F.col("s"))
            / (F.col("n") * F.lit(1000000.0))
        ).alias("xent_bits"),
    )



# ---------------------------------------------------------------------------
# Sparse TF-IDF top-k similarity search: "find documents like these"
# through an inverted-index join, the sparse-vector sibling of
# sim_bruteforce_topk (no dense embeddings involved).
# ---------------------------------------------------------------------------

TFIDF_N_PROBES = 5  # doc_id < 5 are the probe documents
TFIDF_TOP_K = 10

TFIDF_TOPK_ORACLE = f"""
with t as (select doc_id, string_split(text, ' ') w from documents),
nn as (select count(*) as n_docs from t),
tok as (select doc_id, unnest(w) as term from t),
tc as (select doc_id, term, count(*) as c from tok group by doc_id, term),
dl as (select doc_id, sum(c) as n from tc group by doc_id),
dfreq as (select term, count(*) as df from tc group by term),
post as (
  select tc.doc_id, tc.term,
         cast(round((tc.c / dl.n) * log2(1.0 + cast(nn.n_docs as double) / dfreq.df)
                    * 1000000) as bigint) as w
  from tc join dl using (doc_id) join dfreq using (term) cross join nn
),
norms as (select doc_id, sum(w * w) as nsq from post group by doc_id),
dots as (
  select p.doc_id as probe_id, d.doc_id, sum(p.w * d.w) as dot
  from post p join post d on p.term = d.term and p.doc_id <> d.doc_id
  where p.doc_id < {TFIDF_N_PROBES}
  group by 1, 2
),
scored as (
  select probe_id, dots.doc_id,
         dot / (sqrt(np.nsq) * sqrt(nd.nsq)) as cos
  from dots
  join norms np on np.doc_id = probe_id
  join norms nd on nd.doc_id = dots.doc_id
),
ranked as (
  select probe_id, doc_id, cos,
         row_number() over (partition by probe_id
                            order by cos desc, doc_id) as rk
  from scored
)
select probe_id, doc_id, round(cos, 6) as cosine, cast(rk as bigint) as rk
from ranked where rk <= {TFIDF_TOP_K}
"""


@register(
    "txt_tfidf_topk_similar",
    f"Sparse TF-IDF top-{TFIDF_TOP_K} similarity search for "
    f"{TFIDF_N_PROBES} probe documents through an inverted-index join: "
    "tf-idf postings per (doc, term); the probes' postings are tiny and "
    "BROADCAST (bounded by k probes x doc length), while the "
    "vocabulary-sized term->df map joins on term with NO hint -- AQE "
    "broadcasts it only while it is actually small -- so the corpus "
    "posting list is scanned once with no all-pairs expansion: the "
    "sparse-vector sibling of "
    "sim_bruteforce_topk. Weights are micro-scaled bigints (smoothed "
    "idf log2(1 + N/df)), so dots and norms are exact integer "
    "aggregates and the cosine divides identical operands in both "
    "engines; ranking ties break on doc_id.",
    TFIDF_TOPK_ORACLE,
    "text", "similarity", "inverted-index",
)
def txt_tfidf_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens().alias("w")
    )
    nn = docs.agg(F.count("*").alias("n_docs"))
    tok = docs.select("doc_id", F.explode("w").alias("term"))
    tc = tok.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    dl = tc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    dfreq = tc.groupBy("term").agg(F.count("*").alias("df"))
    # dl is per-doc (corpus-sized) and dfreq is vocabulary-sized: both
    # join plainly on their keys; only the 1-row corpus count broadcasts
    post = (
        tc.join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("c") / F.col("n"))
                * F.log2(
                    1.0 + F.col("n_docs").cast("double") / F.col("df")
                )
                * 1e6
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    # postings feed three consumers (norms, probes, the corpus side of
    # the dot join): persist once instead of re-tokenizing the corpus
    # three times
    post = _persist_swap(spark, "tfidf_post", post)
    norms = post.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("nsq")
    )
    probes = F.broadcast(
        post.where(F.col("doc_id") < TFIDF_N_PROBES).select(
            F.col("doc_id").alias("probe_id"),
            F.col("term").alias("p_term"),
            F.col("w").alias("p_w"),
        )
    )
    dots = (
        probes.join(
            post,
            (F.col("p_term") == F.col("term"))
            & (F.col("probe_id") != F.col("doc_id")),
        )
        .groupBy("probe_id", "doc_id")
        .agg(F.sum(F.col("p_w") * F.col("w")).alias("dot"))
    )
    # probe norms: filter to the k probes BEFORE broadcasting -- the
    # unfiltered norms relation is corpus-sized
    np_ = F.broadcast(
        norms.where(F.col("doc_id") < TFIDF_N_PROBES).select(
            F.col("doc_id").alias("probe_id"), F.col("nsq").alias("nsq_p")
        )
    )
    nd = norms.select("doc_id", F.col("nsq").alias("nsq_d"))
    cos = F.col("dot") / (F.sqrt("nsq_p") * F.sqrt("nsq_d"))
    wnd = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("doc_id")
    )
    return (
        dots.join(np_, "probe_id")
        .join(nd, "doc_id")
        .select("probe_id", "doc_id", cos.alias("cos"))
        .withColumn("rk", F.row_number().over(wnd).cast("bigint"))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .select(
            "probe_id", "doc_id", F.round("cos", 6).alias("cosine"), "rk"
        )
    )


# ---------------------------------------------------------------------------
# The whole curation pipeline as ONE query: quality gate -> perplexity
# band -> exact dedup -> MinHash near-dedup -> train split ->
# decontamination -> mixture balancing, reported as a survivor funnel.
# ---------------------------------------------------------------------------

FUNNEL_XENT_MAX = 4.95  # drop the high-surprisal tail (CCNet-style)


def _funnel_oracle() -> str:
    from clueso_spark.plans.dedup_queries import _MINHASH_ORACLE

    stages = [
        (0, "input", "base"),
        (1, "quality", "q1"),
        (2, "perplexity", "s2"),
        (3, "exact_dedup", "s3"),
        (4, "near_dedup", "s4"),
        (5, "train_split", "s5"),
        (6, "decontaminated", "s6"),
        (7, "mixture_balanced", "s7"),
    ]
    counts = "\nunion all\n".join(
        f"select cast({i} as bigint) as stage, '{name}' as stage_name,"
        f" cast(count(*) as bigint) as n_docs,"
        f" cast(coalesce(sum(n_chars), 0) as bigint) as n_chars from {rel}"
        for i, name, rel in stages
    )
    return f"""
with base as (
  select doc_id, source, n_chars, text, string_split(text, ' ') w,
         cast(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8)) as bigint)
           % 100 as pct
  from documents
),
q1 as (
  select * from base
  where len(list_filter(w, x -> x in ({_SW})))::double / len(w) > 0.05
    and len(list_distinct(w))::double / len(w) > 0.2
    and n_chars >= 100
),
tok as (select doc_id, unnest(w) as term from base),
tf as (select term, count(*) as c from tok group by term),
tot as (select cast(round(log2(sum(c)) * 1000000) as bigint) as l_total
        from tf),
lpt as (select term, cast(round(log2(c) * 1000000) as bigint) as lp from tf),
px as (
  select doc_id, (n * l_total - s) / (n * 1000000.0) as xent
  from (select doc_id, count(*) as n, sum(lp) as s
        from tok join lpt using (term) group by doc_id)
  cross join tot
),
s2 as (select q1.* from q1 join px using (doc_id)
       where xent <= {FUNNEL_XENT_MAX}),
s3 as (
  select doc_id, source, n_chars, text, w, pct from (
    select s2.*,
           min(doc_id) over (partition by md5(lower(trim(text)))) as mn
    from s2)
  where doc_id = mn
),
losers as (select distinct doc_b as doc_id from ({_MINHASH_ORACLE})),
s4 as (select * from s3
       where doc_id not in (select doc_id from losers)),
s5 as (select * from s4 where pct < 80),
g as (
  select doc_id,
         case when len(w) < 3 then []
              else list_distinct(list_transform(range(1, len(w) - 1),
                   i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) end
           as grams
  from base
),
testg as (
  select distinct unnest(g.grams) as gram
  from g join base using (doc_id) where base.pct >= 90
),
sgr as (select s5.doc_id, unnest(g.grams) as gram
        from s5 join g using (doc_id)),
hits as (select doc_id, count(*) as n_hit
         from sgr join testg using (gram) group by doc_id),
ng as (select s5.doc_id, len(g.grams) as n_grams
       from s5 join g using (doc_id)),
contam as (
  select ng.doc_id from ng join hits using (doc_id)
  where n_grams > 0 and n_hit::double / n_grams > 0.8
),
s6 as (select * from s5
       where doc_id not in (select doc_id from contam)),
stats as (select source, sum(n_chars) as cb from s6 group by source),
mmin as (select min(cb) as min_chars from stats),
thr as (select source, least(10000, min_chars * 10000 // cb)
          as threshold_bp
        from stats cross join mmin),
s7 as (
  select s6.* from s6 join thr using (source)
  where cast(('0x' || substr(md5('mix_' || cast(doc_id as varchar)), 1, 8))
             as bigint) % 10000 < threshold_bp
)
{counts}
"""


@register(
    "pipeline_pretraining_funnel",
    "The COMPLETE curation pipeline as one lazy plan, reported as a "
    "survivor funnel: input -> cheap quality gate -> unigram-LM "
    f"perplexity band (xent <= {FUNNEL_XENT_MAX} bits) -> exact dedup "
    "(md5 group min) -> MinHash-LSH near-dedup (drop verified losers) "
    "-> content-hash train split -> test-set n-gram decontamination -> "
    "source-mixture balancing. Every stage count is an exact bigint, "
    "so the end-to-end composition -- not just each operator alone -- "
    "is hash-verified cross-engine. Scale: the heavy columns live ONLY "
    "in one persisted base projection (tokenize, quality HOF, term "
    "stream, shingles, grams -- one pass each; the embedded MinHash "
    "stage consumes it too, not a second corpus scan). Stage "
    "membership is monotone, so the funnel is ONE slim per-doc "
    "survival-flags relation (a boolean column per stage, built by the "
    "same keyed joins/windows each operator pays standalone: term "
    "count, band join, gram join, source stats) and the whole 8-stage "
    "report is a SINGLE conditional-sum aggregate over it -- not 8 "
    "count branches re-walking the DAG, which is what made the r6 "
    "funnel's cold start 2.5x its warm cost; the term->logprob map "
    "joins plainly on term (AQE broadcasts it only while the vocab is "
    "actually small).",
    _funnel_oracle(),
    "pipeline", "funnel", "composition",
)
def pipeline_pretraining_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clueso_spark.functions.text import stopword_count
    from clueso_spark.plans.dedup_queries import minhash_pairs

    docs = (
        load_table_spread(spark, sf_dir, "documents")
        .withColumn("w", tokens())
    )
    pct = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    # The exact-dedup fingerprint is the ONLY consumer of raw text, so
    # it is folded into the base projection and the text column itself
    # never enters the persist: pinning the full corpus text
    # MEMORY_AND_DISK alongside the token arrays roughly doubled the
    # cached footprint for a column read exactly once -- at 100 TB that
    # is corpus-sized cache pressure, and in a multi-query bench session
    # it was the leading suspect for the r7 driver-bench blowup
    # (BENCH_r07 34.4 s vs the quiet 5.3 s on identical code).
    base = docs.select(
        "doc_id",
        "source",
        "n_chars",
        "w",
        pct.alias("pct"),
        F.md5(F.lower(F.trim("text"))).alias("fp"),
    )
    base = _persist_swap(spark, "funnel_base", base)
    n_tok = F.size("w")
    # Survival flags, not stage relations: membership is monotone
    # (ok{k+1} => ok{k}), so the funnel is ONE slim per-doc row whose
    # boolean columns accumulate left-to-right, and the report is a
    # single conditional-sum aggregate. The heavy token column is read
    # only from the persisted base: this quality projection, the term
    # stream, the shingles (inside minhash_pairs) and the grams -- one
    # pass each.
    f0 = base.select(
        "doc_id",
        "source",
        "n_chars",
        "pct",
        (
            (stopword_count("w").cast("double") / n_tok > 0.05)
            & (F.size(F.array_distinct("w")).cast("double") / n_tok > 0.2)
            & (F.col("n_chars") >= 100)
        ).alias("ok1"),
        "fp",
    )
    tok = base.select("doc_id", F.explode("w").alias("term"))
    tf = tok.groupBy("term").agg(F.count("*").alias("c"))
    tot = tf.agg(
        F.round(F.log2(F.sum("c")) * 1e6).cast("bigint").alias("l_total")
    )
    lpt = tf.select(
        "term", F.round(F.log2("c") * 1e6).cast("bigint").alias("lp")
    )
    # plain equi-join on term (NOT a forced broadcast): the vocabulary
    # grows with the corpus (Heaps' law -> 1e8-1e9 terms at 100 TB), so
    # AQE picks the strategy from the aggregate's actual runtime size --
    # broadcast while the vocab is small, shuffle join once it isn't
    px = (
        tok.join(lpt, "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.sum("lp").alias("s"))
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (
                (F.col("n") * F.col("l_total") - F.col("s"))
                / (F.col("n") * F.lit(1000000.0))
            ).alias("xent"),
        )
    )
    # token-less docs have no px row: left join + coalesce(false)
    # replicates the old inner join's drop
    f1 = f0.join(px, "doc_id", "left").withColumn(
        "ok2",
        F.col("ok1")
        & F.coalesce(F.col("xent") <= FUNNEL_XENT_MAX, F.lit(False)),
    )
    # exact dedup as a flag: keeper = min doc_id among the group's
    # perplexity survivors (one keyed shuffle of the slim relation)
    wfp = Window.partitionBy("fp")
    f2 = f1.withColumn(
        "ok3",
        F.col("ok2")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("ok2"), F.col("doc_id"))).over(wfp)
        ),
    )
    # near-dedup: MinHash-LSH losers over the SAME persisted base (own
    # persist slot inside, so the standalone dedup_minhash_lsh query
    # and the funnel never evict each other)
    losers = (
        minhash_pairs(spark, base, slot="funnel_minhash_sets")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("lost", F.lit(True))
    )
    f3 = (
        f2.join(losers, "doc_id", "left")
        .withColumn(
            "ok4", F.col("ok3") & ~F.coalesce(F.col("lost"), F.lit(False))
        )
        .withColumn("ok5", F.col("ok4") & (F.col("pct") < 80))
        .select(
            "doc_id", "source", "n_chars", "pct",
            "ok1", "ok2", "ok3", "ok4", "ok5",
        )
    )
    # two consumers (decontamination branch + everything downstream):
    # persist the slim flags relation once
    f3 = _persist_swap(spark, "funnel_flags", f3)
    # decontamination: n-gram overlap vs the held-out split, evaluated
    # only for train-split survivors (same as the standalone operator)
    grams = F.array_distinct(F.transform(word_shingles("w", 3), F.md5))
    g = base.select("doc_id", F.col("pct").alias("g_pct"), grams.alias("grams"))
    testg = (
        g.where(F.col("g_pct") >= 90)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    sg = f3.where("ok5").select("doc_id").join(g, "doc_id").select(
        "doc_id", F.size("grams").alias("n_grams"), "grams"
    )
    hits = (
        sg.select("doc_id", F.explode("grams").alias("gram"))
        .join(testg, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    contam = (
        sg.join(hits, "doc_id")
        .where(
            (F.col("n_grams") > 0)
            & (F.col("n_hit").cast("double") / F.col("n_grams") > 0.8)
        )
        .select("doc_id")
        .withColumn("contam", F.lit(True))
    )
    f4 = f3.join(contam, "doc_id", "left").withColumn(
        "ok6", F.col("ok5") & ~F.coalesce(F.col("contam"), F.lit(False))
    )
    # two consumers again (mixture stats + the final aggregate)
    f4 = _persist_swap(spark, "funnel_flags6", f4)
    stats = (
        f4.where("ok6").groupBy("source").agg(F.sum("n_chars").alias("cb"))
    )
    mmin = stats.agg(F.min("cb").alias("min_chars"))
    thr = stats.crossJoin(F.broadcast(mmin)).select(
        "source",
        F.expr("least(10000, min_chars * 10000 div cb)").alias(
            "threshold_bp"
        ),
    )
    mix_hash = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    # sources absent from thr have no ok6 survivors, so coalesce(false)
    # is vacuous for live rows -- it only keeps the flag non-null
    f5 = f4.join(F.broadcast(thr), "source", "left").withColumn(
        "ok7",
        F.col("ok6")
        & F.coalesce(mix_hash < F.col("threshold_bp"), F.lit(False)),
    )
    # ---- the whole 8-stage report: ONE aggregate, then stack to rows --
    stage_names = [
        "input",
        "quality",
        "perplexity",
        "exact_dedup",
        "near_dedup",
        "train_split",
        "decontaminated",
        "mixture_balanced",
    ]
    aggs = []
    for i, _name in enumerate(stage_names):
        cond = F.lit(True) if i == 0 else F.col(f"ok{i}")
        aggs.append(
            F.coalesce(F.sum(F.when(cond, 1)), F.lit(0))
            .cast("bigint")
            .alias(f"c{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(cond, F.col("n_chars"))), F.lit(0))
            .cast("bigint")
            .alias(f"b{i}")
        )
    one = f5.agg(*aggs)
    stack_args = ", ".join(
        f"{i}L, '{name}', c{i}, b{i}" for i, name in enumerate(stage_names)
    )
    return one.selectExpr(
        f"stack(8, {stack_args}) as (stage, stage_name, n_docs, n_chars)"
    )
