"""Deduplication over ``documents``: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Scale design (the whole point of these operators at 100 TB):
  * NO all-pairs crossJoin anywhere. Every candidate-pair step is an
    equi-join on a *bucket key* -- an LSH band signature, a SimHash
    sketch, or a blocking key -- so the shuffle is keyed and the pair
    space is the per-bucket square, not the corpus square.
  * Hashes are md5 hex strings: uniform, engine-independent, and
    lexicographically comparable -- which is what lets a DuckDB oracle
    verify the exact same LSH algorithm end-to-end.
  * Verification (exact Jaccard) runs only on surviving candidates.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clueso_spark.functions.text import STOPWORDS, tokens, word_shingles
from clueso_spark.plans.catalog import register
from clueso_spark.sources.tables import load_table

N_BANDS = 8

#: shingle-set DataFrames persisted by dedup_minhash_lsh; the next call
#: unpersists the previous one so repeated runs (bench best-of-N, the
#: curation pipeline) never accumulate cache entries.
_PERSISTED_SETS: list[DataFrame] = []


@register(
    "dedup_exact_summary",
    "Exact-dup profile in one pass: total docs, distinct raw texts, "
    "distinct normalized texts, duplicate-group count (md5 hash groupBy; "
    "the 100 TB shape -- hash once, aggregate, never compare strings).",
    """
    with h as (select md5(lower(trim(text))) as fp, text from documents)
    select cast(count(*) as bigint) as n_docs,
           cast(count(distinct text) as bigint) as n_distinct_raw,
           cast(count(distinct fp) as bigint) as n_distinct_norm,
           cast(count(*) - count(distinct fp) as bigint) as n_dup_rows
    from h
    """,
    "dedup", "exact",
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return docs.select(fp.alias("fp"), "text").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("text").cast("bigint").alias("n_distinct_raw"),
        F.count_distinct("fp").cast("bigint").alias("n_distinct_norm"),
        (F.count("*") - F.count_distinct("fp")).cast("bigint").alias("n_dup_rows"),
    )


_MINHASH_ORACLE = f"""
with t as (select doc_id, string_split(text, ' ') w from documents),
sh as (
  select distinct doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) as shingle
  from t where len(w) >= 3
),
bands as (
  select doc_id, b.range as band,
         min(substr(md5(shingle) || md5('~' || shingle),
                    cast(b.range * 8 + 1 as int), 8)) as sig
  from sh cross join range({N_BANDS}) b
  group by doc_id, b.range
),
cand as (
  select distinct a.doc_id as doc_a, b.doc_id as doc_b
  from bands a join bands b on a.band = b.band and a.sig = b.sig
                           and a.doc_id < b.doc_id
),
sets as (select doc_id, list(shingle) ss from sh group by doc_id)
select doc_a, doc_b,
       len(list_intersect(x.ss, y.ss))::double
         / len(list_distinct(x.ss || y.ss)) as jaccard
from cand join sets x on doc_a = x.doc_id
          join sets y on doc_b = y.doc_id
where len(list_intersect(x.ss, y.ss))::double
        / len(list_distinct(x.ss || y.ss)) >= 0.5
"""


@register(
    "dedup_minhash_lsh",
    f"MinHash+LSH near-dedup: word-3-shingles -> {N_BANDS} banded minhash "
    "signatures -> equi-join on (band, sig) for candidates -> exact "
    "Jaccard >= 0.5 verification. The candidate join is keyed (no "
    "CartesianProduct node); at 100 TB the band shuffle is the only "
    "corpus-wide movement.",
    _MINHASH_ORACLE,
    "dedup", "minhash", "lsh",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row signature computation: shingle set + 8 band minhashes are
    # pure Column algebra (array_distinct / transform / array_min) -- NO
    # shuffle happens until the candidate equi-join itself. At 100 TB this
    # is one narrow scan followed by one keyed shuffle on (band, sig).
    # single-file local scans get 1 task; spread the (interpreted,
    # HOF-heavy) shingle+hash projection across all cores. On a real
    # cluster the scan already has one split per 128 MB and this
    # repartition coalesces away under AQE.
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("w", tokens())
        .where(F.size("w") >= 3)  # cheap pre-filter, not size(ss) > 0
    )
    sets = docs.select(
        "doc_id", F.array_distinct(word_shingles("w", 3)).alias("ss")
    )
    # two consumers read the shingle sets (the band branch below and the
    # verification join at the end); persist so tokenize+shingle runs ONCE
    # instead of twice. MEMORY_AND_DISK: at 100 TB the shingle sets spill
    # rather than OOM, and recomputation (a full corpus re-scan) is the
    # costlier alternative. Unpersist whatever a previous call pinned.
    while _PERSISTED_SETS:
        _PERSISTED_SETS.pop().unpersist()
    sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_SETS.append(sets)
    # hash every shingle TWICE (64 hex chars); each band's minhash is the
    # min over a disjoint 8-hex slice -- 2 md5 + 8 substrings per shingle,
    # not 8 md5s. Band width matters: a 4-hex band (16-bit space) makes
    # min-of-N concentrate near zero and floods verification with false
    # candidates (measured 117k pairs at sf0.1); 8 hex (2^32) makes false
    # band collisions ~N^2/2^32 ~ 0.
    sets = sets.withColumn(
        "hs", F.expr("transform(ss, s -> concat(md5(s), md5(concat('~', s))))")
    )
    band_sig = [
        F.expr(
            f"array_min(transform(hs, h -> substring(h, {8 * b + 1}, 8)))"
        ).alias(f"sig_{b}")
        for b in range(N_BANDS)
    ]
    stack_args = ", ".join(f"{b}, sig_{b}" for b in range(N_BANDS))
    # band rows stay (doc_id, band, sig) -- the 8x stack must NOT carry the
    # shingle arrays, or the band shuffle payload multiplies by 8
    long = sets.select("doc_id", *band_sig).select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) as (band, sig)")
    )
    # candidate pairs via ONE shuffle: group each (band, sig) bucket,
    # emit the per-bucket pair combinations. A self-join would re-evaluate
    # the whole shingle+hash projection on both branches; this evaluates
    # it once. Per-bucket pair fan-out is the LSH contract (buckets are
    # tiny for honest thresholds).
    cand = (
        long.groupBy("band", "sig")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .where(F.size("ds") > 1)
        .select(
            F.explode(
                F.expr(
                    """flatten(transform(sequence(1, size(ds) - 1),
                         i -> transform(sequence(i + 1, size(ds)),
                           j -> struct(element_at(ds, i) as doc_a,
                                       element_at(ds, j) as doc_b))))"""
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # verification: melt each pair into (pair, doc_id) rows and join the
    # shingle sets back ONCE (a second join branch would re-evaluate the
    # whole shingle projection); min_by/max_by reassemble the pair's two
    # sets (doc_a < doc_b by construction).
    melted = cand.select(F.struct("doc_a", "doc_b").alias("pair")).select(
        "pair",
        F.explode(F.array("pair.doc_a", "pair.doc_b")).alias("doc_id"),
    )
    joined = melted.join(sets, "doc_id").groupBy("pair").agg(
        F.min_by("ss", "doc_id").alias("ss_a"),
        F.max_by("ss", "doc_id").alias("ss_b"),
    )
    jac = F.size(F.array_intersect("ss_a", "ss_b")).cast("double") / F.size(
        F.array_union("ss_a", "ss_b")
    )
    return joined.select(
        F.col("pair.doc_a").alias("doc_a"),
        F.col("pair.doc_b").alias("doc_b"),
        jac.alias("jaccard"),
    ).where(F.col("jaccard") >= 0.5)


_SIMHASH_ORACLE = """
with words as (
  select distinct doc_id, unnest(string_split(text, ' ')) as word from documents
),
sums as (
  select doc_id, {sums}
  from words group by doc_id
),
sk as (select doc_id, {bits} as simhash from sums)
select simhash,
       cast(count(*) as bigint) as n_docs,
       string_agg(doc_id, ',' order by doc_id) as doc_ids
from sk group by simhash having count(*) > 1
""".format(
    sums=", ".join(
        "sum(case when strpos('0123456789abcdef', substr(md5(word), {p}, 1)) - 1 >= 8"
        " then 1 else -1 end) as s{j}".format(p=j + 1, j=j)
        for j in range(16)
    ),
    bits="concat("
    + ", ".join(f"case when s{j} >= 0 then '1' else '0' end" for j in range(16))
    + ")",
)


@register(
    "dedup_simhash",
    "SimHash near-dedup: 16-bit nibble-level simhash over the distinct "
    "word set (md5-derived, engine-independent); docs sharing a sketch "
    "are duplicate candidates. One groupBy on the sketch -- the cheapest "
    "possible near-dup pass at scale.",
    _SIMHASH_ORACLE,
    "dedup", "simhash",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("w", tokens())
    words = docs.select(
        "doc_id", F.explode(F.array_distinct("w")).alias("word")
    )
    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.expr(
                    f"case when instr('0123456789abcdef', substring(md5(word), {j + 1}, 1))"
                    " - 1 >= 8 then 1 else -1 end"
                )
            ).alias(f"s{j}")
            for j in range(16)
        ]
    )
    bits = F.concat(
        *[F.when(F.col(f"s{j}") >= 0, "1").otherwise("0") for j in range(16)]
    )
    return (
        sums.select("doc_id", bits.alias("simhash"))
        .groupBy("simhash")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.expr(
                "array_join(transform(sort_array(collect_list(doc_id)),"
                " x -> cast(x as string)), ',')"
            ).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


@register(
    "dedup_ngram_jaccard",
    "Blocked n-gram Jaccard: candidate pairs restricted to a blocking key "
    "(language), exact word-set Jaccard >= 0.8 inside each block. The "
    "block key caps the pair space; at 100 TB the block would be an LSH "
    "band (see dedup_minhash_lsh) -- same plan shape.",
    """
    with s as (select doc_id, lang, list_distinct(string_split(text, ' ')) ws
               from documents)
    select a.doc_id as doc_a, b.doc_id as doc_b,
           len(list_intersect(a.ws, b.ws))::double
             / len(list_distinct(a.ws || b.ws)) as jaccard
    from s a join s b on a.lang = b.lang and a.doc_id < b.doc_id
    where len(list_intersect(a.ws, b.ws))::double
            / len(list_distinct(a.ws || b.ws)) >= 0.8
    """,
    "dedup", "jaccard",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id", "lang", F.array_distinct(tokens()).alias("ws")
    )
    a, b = s.alias("a"), s.alias("b")
    jac = F.size(F.array_intersect("a.ws", "b.ws")).cast("double") / F.size(
        F.array_union("a.ws", "b.ws")
    )
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.8)
    )


CURATION_ORACLE = f"""
with pairs as ({_MINHASH_ORACLE}),
losers as (select distinct doc_b as doc_id from pairs),
t as (select doc_id, lang, n_chars, string_split(text, ' ') w
      from documents),
q as (
  select doc_id, lang, n_chars
  from t
  where len(list_filter(w, x -> x in ({{sw}})))::double / len(w) > 0.05
    and len(list_distinct(w))::double / len(w) > 0.2
    and n_chars >= 100
)
select lang,
       cast(count(*) as bigint) as n_kept,
       cast(sum(n_chars) as bigint) as kept_chars
from q
where doc_id not in (select doc_id from losers)
group by lang
"""


@register(
    "pipeline_curated_corpus",
    "End-to-end curation pipeline: quality gate (stopword/uniqueness/"
    "length) -> near-dup removal (drop the higher doc_id of each >=0.5 "
    "Jaccard LSH pair) -> per-language kept-volume report. The "
    "composition a training-data pipeline actually runs; every stage is "
    "one of this engine's verified operators chained lazily into a "
    "single plan (quality filter + anti join + aggregate).",
    CURATION_ORACLE.format(sw=", ".join(f"'{w}'" for w in STOPWORDS)),
    "dedup", "pipeline", "quality",
)
def pipeline_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clueso_spark.functions.text import stopword_count

    docs = load_table(spark, sf_dir, "documents").withColumn("w", tokens())
    n_tok = F.size("w")
    quality = docs.where(
        (stopword_count("w").cast("double") / n_tok > 0.05)
        & (F.size(F.array_distinct("w")).cast("double") / n_tok > 0.2)
        & (F.col("n_chars") >= 100)
    )
    losers = (
        dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.join(losers, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )


@register(
    "dedup_embedding_cosine",
    "Embedding-cosine near-dup: pairs with cosine >= 0.4, blocked on the "
    "label column (the IVF-cell stand-in). Cosine in double precision "
    "with sequential fold on both engines; scores rounded to 6 dp.",
    """
    with e as (select vec_id, label,
                      list_transform(embedding, x -> cast(x as double)) v
               from embeddings),
    n as (select vec_id, label, v, list_dot_product(v, v) as sq from e)
    select a.vec_id as vec_a, b.vec_id as vec_b,
           round(list_dot_product(a.v, b.v) / (sqrt(a.sq) * sqrt(b.sq)), 6)
             as cosine
    from n a join n b on a.label = b.label and a.vec_id < b.vec_id
    where list_dot_product(a.v, b.v) / (sqrt(a.sq) * sqrt(b.sq)) >= 0.4
    """,
    "dedup", "embedding",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clueso_spark.functions.vectors import (
        cosine_similarity,
        squared_norm,
        to_double_array,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    n = emb.withColumn("sq", squared_norm("v"))
    a, b = n.alias("a"), n.alias("b")
    cos = cosine_similarity("a.v", "b.v", "a.sq", "b.sq")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("raw_cos"),
        )
        .where(F.col("raw_cos") >= 0.4)
        .select("vec_a", "vec_b", F.round("raw_cos", 6).alias("cosine"))
    )


_CC_ORACLE = f"""
with recursive pairs as ({_MINHASH_ORACLE}),
edges as (
  select doc_a as u, doc_b as v from pairs
  union
  select doc_b as u, doc_a as v from pairs
),
verts as (select distinct u from edges),
reach as (
  select u, u as v from verts
  union
  select r.u, e.v from reach r join edges e on r.v = e.u
),
comp as (select u as doc_id, min(v) as component from reach group by u)
select cast(component as bigint) as component,
       cast(count(*) as bigint) as n_docs,
       string_agg(cast(doc_id as varchar), ',' order by doc_id) as doc_ids
from comp
group by component
"""


@register(
    "dedup_connected_components",
    "Duplicate GROUPS, not just pairs: connected components over the "
    "MinHash-LSH pair graph via min-label propagation iterated to "
    "fixpoint (the GraphX/GraphFrames pattern). Each round is one keyed "
    "join + aggregate; lineage is cut per round with localCheckpoint -- "
    "without it, iteration N replays all N-1 predecessors and the plan "
    "grows unboundedly (the classic iterative-Spark failure at scale). "
    "Oracle: DuckDB recursive-CTE transitive closure.",
    _CC_ORACLE,
    "dedup", "graph", "iterative",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clueso_spark.functions.graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("label")
    )
    return labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(
            "array_join(transform(sort_array(collect_list(doc_id)),"
            " x -> cast(x as string)), ',')"
        ).alias("doc_ids"),
    ).select(
        F.col("label").cast("bigint").alias("component"), "n_docs", "doc_ids"
    )
